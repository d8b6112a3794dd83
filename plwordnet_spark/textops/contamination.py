"""Benchmark n-gram decontamination for training corpora.

Before training on web text you must measure how much of each document
overlaps a held-out evaluation set — the GPT-3 paper's 13-gram filter
(Brown et al. 2020, App. C) is the canonical recipe: tokenize, form
n-grams, and flag documents whose n-grams collide with the benchmark's.
The reference pipeline has no analogue (its corpora are curated), but
any Common-Crawl-scale training pipeline needs this next to dedup
(:mod:`plwordnet_spark.textops.dedup`).

Spark shape:

1. doc n-grams — ``transform(sequence(0, n_tok − n), i →
   array_join(slice(tokens, i+1, n), ' '))`` then ``explode`` +
   ``distinct`` per doc: all JVM-side higher-order functions, no UDF.
2. benchmark n-grams — same expression over the (small) benchmark
   table, ``distinct`` → explicitly ``broadcast()`` (an eval set is
   MBs; the corpus is the 100 TB side, which therefore never shuffles
   on the n-gram key).
3. per-doc rollup: total distinct n-grams, hits, contamination ratio.

The output keeps EVERY corpus document (hit or not) so the caller can
threshold downstream; filter ``contamination >= t`` to quarantine.

Tokenization is a plain split on ``token_delim`` — byte-exact and
engine-portable so an SQL oracle reproduces the identical n-grams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_contamination", "ngrams_column", "ngrams_from_tokens"]


def ngrams_from_tokens(toks_col: Column | str, n: int) -> Column:
    """array<string> of word n-grams from a TOKEN-ARRAY column (order
    kept, duplicates kept; empty under ``n`` tokens).

    Pass a bound attribute (a column projected in a previous select),
    not an inline expression: the lambda references ``toks_col`` once
    per element, so an inline ``split(...)`` would be re-evaluated
    ~len(toks) times per row — measured 2-10x slower depending on how
    much sits under the split."""
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.array_join(F.slice(toks, i + F.lit(1), n), " "),
        )
    )


def ngrams_column(text_col: Column | str, n: int, token_delim: str = " ") -> Column:
    """Convenience inline form of :func:`ngrams_from_tokens` over a text
    column. For hot paths, project ``F.split(text, delim)`` first and
    use :func:`ngrams_from_tokens` on the bound column (see its note)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return ngrams_from_tokens(F.split(c, token_delim), n)


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_delim: str = " ",
    ratio_decimals: int = 6,
) -> DataFrame:
    """Per-document overlap with the benchmark's n-gram set.

    Returns ``(id_col, n_ngrams, n_hit, contamination)`` — distinct
    n-grams in the document, how many also occur anywhere in
    ``benchmark``'s ``text_col``, and the rounded ratio (0.0 when the
    document is shorter than ``n`` tokens).
    """
    doc_ngrams = (
        docs.select(F.col(id_col), F.split(text_col, token_delim).alias("_toks"))
        .select(F.col(id_col), F.explode(ngrams_from_tokens("_toks", n)).alias("g"))
        .distinct()
    )
    bench = (
        benchmark.select(F.split(text_col, token_delim).alias("_toks"))
        .select(F.explode(ngrams_from_tokens("_toks", n)).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        doc_ngrams.join(F.broadcast(bench), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        )
    )
    # documents with < n tokens produce no n-gram rows: restore them
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.when(F.coalesce("n_ngrams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("n_hit") / F.col("n_ngrams"), ratio_decimals)
            )
            .alias("contamination"),
        )
    )
