"""Within-document repetition filters (Gopher rules 4-13).

Machine-generated and boilerplate-heavy web pages repeat themselves:
the same line pasted dozens of times, one n-gram covering half the
text. Rae et al. 2021 ("Scaling Language Models: ... Gopher", App. A)
filter documents by (a) the fraction of duplicate lines, (b) the
fraction of characters in duplicate lines, (c) the fraction of
characters covered by the single most frequent n-gram, and (d) the
fraction of characters in ALL duplicated n-grams. This module provides
those four signals over a text column. The reference pipeline has no
analogue (curated corpora); any Common-Crawl-scale pipeline runs these
next to the cross-document filters in :mod:`plwordnet_spark.textops.lines`
and :mod:`plwordnet_spark.textops.dedup`.

Scale shape — ZERO SHUFFLE. Every metric is a per-row column
expression: n-grams via ``transform``/``slice`` (the
:func:`plwordnet_spark.textops.contamination.ngrams_from_tokens`
mechanism), then a single ``aggregate`` over the *sorted* gram array
that folds run-lengths into (duplicate-chars, top-count, top-gram) in
one O(L log L) pass. No explode, no groupBy: at 100 TB the operator is
a codegen'd map over the scan, embarrassingly parallel, and stacks
under any later filter without adding a stage. (The alternative —
explode every n-gram occurrence and groupBy (doc, gram) — shuffles the
full token stream; fine at GBs, the dominant cost at TBs.)

Definitions (denominator = ``length(text)`` throughout; delimiters
count, which keeps the oracle byte-exact and engine-portable):

- ``dup_line_frac``      = (#lines − #distinct lines) / #lines
- ``dup_line_char_frac`` = Σ over repeated lines of (c−1)·len(line) / len(text)
- ``top_{n}gram_char_frac`` = c_top · len(g_top) / len(text), where the
  top gram is chosen by (count DESC, gram ASC) — deterministic ties
- ``dup_{n}gram_char_frac`` = Σ over grams with c ≥ 2 of c·len(g) / len(text)

As in the published implementations, overlapping occurrences are
counted independently (an upper bound on distinct covered characters).

Tokenization: newlines are folded to spaces, then a plain single-space
split — byte-exact and portable so a SQL oracle replays the identical
grams (same contract as :mod:`plwordnet_spark.textops.contamination`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from plwordnet_spark.textops.contamination import ngrams_from_tokens

__all__ = ["ngram_run_stats", "repetition_features"]


def _close_run(state: Column) -> Column:
    """Fold the in-flight run of ``state.prev`` into the totals.

    Returns struct(dup, bestc, bestg) — duplicate-gram characters so
    far, count and value of the best (count DESC, gram ASC) gram.
    Strict ``>`` keeps the FIRST gram reaching the max count; the scan
    runs over a sorted array, so that is the lexicographically
    smallest — deterministic under any partitioning or engine.
    """
    closed_dup = state.dup + F.when(
        state.run >= 2, state.run * F.length(state.prev)
    ).otherwise(F.lit(0).cast("long"))
    better = state.run > state.bestc
    return F.struct(
        closed_dup.alias("dup"),
        F.when(better, state.run).otherwise(state.bestc).alias("bestc"),
        F.when(better, state.prev).otherwise(state.bestg).alias("bestg"),
    )


def ngram_run_stats(toks_col: Column | str, n: int) -> Column:
    """struct(dup_chars, top_count, top_gram) for word n-grams of a
    token-array column, in one sorted-run-length ``aggregate`` pass.

    ``dup_chars`` = Σ over grams occurring ≥ 2 times of count·len(gram);
    ``top_gram`` = the (count DESC, gram ASC)-first gram ('' when the
    document is shorter than ``n`` tokens), ``top_count`` its count.
    Pass a bound attribute, not an inline expression (see
    :func:`~plwordnet_spark.textops.contamination.ngrams_from_tokens`).
    """
    grams = F.array_sort(ngrams_from_tokens(toks_col, n))
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("bestc"),
        F.lit("").alias("bestg"),
    )

    def step(s: Column, x: Column) -> Column:
        closed = _close_run(s)
        return F.when(
            (s.run > 0) & (x == s.prev),
            F.struct(
                s.prev.alias("prev"),
                (s.run + 1).alias("run"),
                s.dup.alias("dup"),
                s.bestc.alias("bestc"),
                s.bestg.alias("bestg"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                closed.dup.alias("dup"),
                closed.bestc.alias("bestc"),
                closed.bestg.alias("bestg"),
            )
        )

    def finish(s: Column) -> Column:
        closed = _close_run(s)
        return F.struct(
            closed.dup.alias("dup_chars"),
            closed.bestc.alias("top_count"),
            closed.bestg.alias("top_gram"),
        )

    return F.aggregate(grams, init, step, finish)


def repetition_features(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2,),
    dup_ns: tuple[int, ...] = (3,),
    line_delim: str = "\n",
    decimals: int = 6,
) -> DataFrame:
    """Append the four Gopher repetition signals as rounded fractions.

    Adds ``dup_line_frac``, ``dup_line_char_frac``, and per requested
    n ``top_{n}gram_char_frac`` / ``dup_{n}gram_char_frac``. All-equal
    short documents get well-defined values (0 lines → 0.0 fractions).
    Filter downstream, e.g. Gopher drops docs with
    ``dup_line_frac > 0.3`` or ``top_2gram_char_frac > 0.2``.
    """
    text = F.col(text_col)
    total = F.length(text)

    lines = F.filter(
        F.split(text, line_delim), lambda l: F.length(l) > 0
    )
    n_lines = F.size(lines)
    distinct_lines = F.array_distinct(lines)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    distinct_line_chars = F.aggregate(
        distinct_lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)),
            decimals,
        )

    out = df.withColumns(
        {
            "dup_line_frac": frac(n_lines - F.size(distinct_lines), n_lines),
            "dup_line_char_frac": frac(line_chars - distinct_line_chars, total),
        }
    )
    # one bound token array shared by every n (split evaluated once)
    toks = F.filter(
        F.split(F.regexp_replace(text, line_delim, " "), " "),
        lambda w: F.length(w) > 0,
    )
    out = out.withColumn("__toks", toks)
    cols: dict[str, Column] = {}
    for n in sorted(set(top_ns) | set(dup_ns)):
        st = ngram_run_stats(F.col("__toks"), n)
        if n in top_ns:
            cols[f"top_{n}gram_char_frac"] = frac(
                st.top_count * F.length(st.top_gram), total
            )
        if n in dup_ns:
            cols[f"dup_{n}gram_char_frac"] = frac(st.dup_chars, total)
    return out.withColumns(cols).drop("__toks")
