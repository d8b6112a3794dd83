"""Collocation extraction: PMI-scored bigrams over a document corpus.

Multiword expressions are first-class lexical units in a wordnet (the
reference's lexical units are frequently multiword lemmas — see the
space-containing lemma handling in plwordnet_handler's lexical-unit
mapping and the MWE-aware text cleanup in its extraction pipeline); at
corpus scale the standard discovery signal is pointwise mutual
information over adjacent token pairs (Church & Hanks 1990).

Scale shape: tokenization and bigram formation are per-row array
expressions (``split`` / ``slice`` / ``arrays_zip`` — whole-stage
codegen, no Python). The only shuffles are the two grouped counts
(unigrams, bigrams), both with map-side partial aggregation; the two
count tables join on single-word keys where the unigram side is
dim-table-sized relative to the bigram side. Everything downstream of
the corpus scan is count-sized, not corpus-sized.

Determinism: counts are exact integers; PMI is a pure function of the
count triple, rounded on output — portable across engines (the DuckDB
driver oracle recomputes it from the same token stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plwordnet_spark.textops.quality import _words

__all__ = ["pmi_bigrams"]


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(w1, w2, n12, pmi) for every adjacent lowercase-token bigram with
    n12 ≥ min_count.

    PMI = log2( (n12/B) / ((n1/N)·(n2/N)) ) with N total tokens, B total
    bigrams, n1/n2 unigram counts. Positive = the pair co-occurs more
    than independence predicts (collocation candidate).
    """
    words = _words(F.col(text_col))
    toks = docs.select(words.alias("ws")).filter(F.size("ws") > 0)
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = toks.filter(F.size("ws") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, F.size("ws") - 1).alias("w1"),
                F.slice("ws", 2, F.size("ws") - 1).alias("w2"),
            )
        ).alias("p")
    )
    big = (
        pairs.select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
        .filter(F.col("n12") >= min_count)
    )
    totals = uni.agg(
        F.sum("n").alias("N")
    ).crossJoin(
        pairs.agg(F.count(F.lit(1)).alias("B"))
    )
    return (
        big.join(uni.select(F.col("w").alias("w1"), F.col("n").alias("n1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("n2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n12",
            F.round(
                F.log2(
                    (F.col("n12") / F.col("B"))
                    / ((F.col("n1") / F.col("N")) * (F.col("n2") / F.col("N")))
                ),
                round_to,
            ).alias("pmi"),
        )
    )
