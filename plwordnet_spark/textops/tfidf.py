"""TF-IDF term weighting and per-document top-k term extraction.

The reference derives per-lexical-unit descriptive terms from usage
examples and definitions (plwordnet_handler's lexical-unit text fields
feed its ML embedding pipeline); at web scale the standard first-pass
signal for "what is this page about" is TF-IDF over the token stream —
it is also the classic quality filter input (documents whose top terms
are all boilerplate score low).

Formula (sklearn's smoothed variant, portable across engines because it
is a pure function of integer counts):

    idf(w) = ln((N + 1) / (df_w + 1)) + 1
    score(d, w) = tf_{d,w} * idf(w)

with N = total documents, df_w = number of documents containing w,
tf raw count of w in d.

Scale shape: tokenization is a per-row array expression (codegen, no
Python). Shuffles: one groupBy (doc_id, w) with map-side partial agg
for tf; one count-sized groupBy w for df; the df table joins back on w
(term-dictionary-sized, far smaller than the token stream); the top-k
window re-shuffles by doc_id, but only the deduplicated (doc, term, tf)
table — already far smaller than the exploded token stream the first
groupBy folded. N is a scalar broadcast. Ranking happens on the exact
(unrounded) score; rounding is applied only on output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plwordnet_spark.textops.quality import _words

__all__ = ["tfidf_top_terms"]


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, term, tf, score, rank) for each document's top-k terms
    by smoothed TF-IDF; ties broken by term ascending (deterministic).
    Documents with no tokens produce no rows.
    """
    n_docs = docs.select(F.count(F.lit(1)).alias("N"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_raw",
            F.col("tf")
            * (F.log((F.col("N") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_raw"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round("score_raw", round_to).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
