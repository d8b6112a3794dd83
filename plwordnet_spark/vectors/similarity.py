"""Similarity search over embedding columns.

The reference serves ANN top-k through Milvus (IVF_FLAT/HNSW, COSINE,
similar_search_handler.py:236-262). Spark has no ANN index; this module
provides

* :func:`cosine_topk` — exact brute-force top-k: broadcast the query
  side, JVM-side dot products via ``zip_with``+``aggregate`` higher-order
  functions, per-query ``row_number`` window. Approximation-free
  (SURVEY.md §4.1 notes this as the deliberate divergence) — the
  correctness baseline.
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane (SimHash
  for vectors) signatures, candidates meet in any matching band bucket,
  exact cosine rerank inside buckets. Recall < 1 by design; band/row
  params trade recall vs join fan-out (IVF/HNSW analog in join form).
* :func:`cosine_pairs` — all-pairs cosine above a threshold via the same
  LSH bucketing (embedding near-dup path for the dedup suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_expr", "cosine_topk", "lsh_bucketed_topk", "cosine_pairs"]


def cosine_expr(a, b):
    """Cosine similarity of two array<float/double> columns (JVM-side)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, vec_id, sim, rank), rank 1..k per query.

    The query side is broadcast (point/batch lookups are small —
    search_handler.py serves per-LU queries); the corpus streams through
    executors once, no shuffle of the corpus.
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cvec"))
    scored = c.join(F.broadcast(q)).select(
        query_id,
        corpus_id,
        cosine_expr(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= F.lit(k)
    )


def _signature_bits(vec_col, planes: list[list[float]]):
    """Sign bits of dot products with fixed random hyperplanes."""
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def _random_planes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def _with_bands(df: DataFrame, vec_col: str, dim: int, n_bands: int, band_bits: int, seed: int) -> DataFrame:
    planes = _random_planes(dim, n_bands * band_bits, seed)
    bits = _signature_bits(F.col(vec_col), planes)
    bands = []
    for b in range(n_bands):
        chunk = bits[b * band_bits : (b + 1) * band_bits]
        code = chunk[0]
        for bit in chunk[1:]:
            code = code * 2 + bit
        bands.append(F.struct(F.lit(b).alias("band"), code.alias("code")))
    return df.withColumn("_band", F.explode(F.array(*bands))).select(
        "*", F.col("_band.band").alias("band"), F.col("_band.code").alias("code")
    ).drop("_band")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share at least one (band, code)
    bucket; exact cosine rerank among candidates. The bucket equi-join
    replaces the cross product — this is what survives a 10^9-vector
    corpus where brute force cannot."""
    c = _with_bands(
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cvec")),
        "_cvec", dim, n_bands, band_bits, seed,
    )
    q = _with_bands(
        queries.select(F.col(query_id), F.col(vec_col).alias("_qvec")),
        "_qvec", dim, n_bands, band_bits, seed,
    )
    candidates = c.join(q, ["band", "code"]).select(
        query_id, corpus_id, "_qvec", "_cvec"
    ).dropDuplicates([query_id, corpus_id])
    scored = candidates.select(
        query_id, corpus_id, cosine_expr(F.col("_qvec"), F.col("_cvec")).alias("sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= F.lit(k)
    )


def cosine_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, sim) pairs with sim ≥ threshold, id_a < id_b —
    LSH-bucketed candidate generation + exact verify."""
    banded = _with_bands(
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        "_vec", dim, n_bands, band_bits, seed,
    )
    a = banded.select("band", "code", F.col("_id").alias("id_a"), F.col("_vec").alias("_va"))
    b = banded.select("band", "code", F.col("_id").alias("id_b"), F.col("_vec").alias("_vb"))
    cand = (
        a.join(b, ["band", "code"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select("id_a", "id_b", cosine_expr(F.col("_va"), F.col("_vb")).alias("sim"))
        .filter(F.col("sim") >= F.lit(threshold))
    )
