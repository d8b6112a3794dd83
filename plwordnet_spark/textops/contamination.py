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

__all__ = ["ngram_contamination", "ngrams_column"]


def ngrams_column(text_col: Column | str, n: int, token_delim: str = " ") -> Column:
    """array<string> of the word n-grams of ``text_col`` (order kept,
    duplicates kept). Empty when the document has fewer than ``n``
    tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, token_delim)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.array_join(F.slice(toks, i + F.lit(1), n), " "),
        )
    )


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
        docs.select(
            F.col(id_col),
            F.explode(ngrams_column(text_col, n, token_delim)).alias("g"),
        )
        .distinct()
    )
    bench = (
        benchmark.select(F.explode(ngrams_column(text_col, n, token_delim)).alias("g"))
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
