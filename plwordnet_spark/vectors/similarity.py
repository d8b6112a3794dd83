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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_expr",
    "cosine_topk",
    "lsh_bucketed_topk",
    "cosine_pairs",
    "LshIndex",
]


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


def _random_planes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def _band_codes_udf(dim: int, n_bands: int, band_bits: int, seed: int):
    """Arrow-batched band-code computation: one numpy matmul of the batch
    against the (n_bits × dim) plane matrix, sign bits packed MSB-first
    into per-band integer codes.

    This replaces the previous per-plane ``aggregate(zip_with(...))``
    plan-literal construction, which at production dims (e.g. 1152 × 64
    bits) inlined ~74k literal expressions into a single projection and
    blew up Catalyst analysis long before data size mattered. The plane
    matrix rides the UDF closure (dim·bits·8 bytes — ~600 KB at 1152×64,
    shipped once per executor, cached by worker reuse).
    """
    planes_t = np.asarray(
        _random_planes(dim, n_bands * band_bits, seed), dtype=np.float64
    ).T  # (dim, n_bits)
    weights = (1 << np.arange(band_bits - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def band_codes(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        zero = np.zeros(planes_t.shape[0], dtype=np.float64)
        for s in batches:
            vals = s.to_numpy()
            if len(vals) == 0:
                yield pd.Series([], dtype=object)
                continue
            null_mask = np.array([v is None for v in vals])
            if null_mask.any():
                vals = np.array(
                    [zero if v is None else v for v in vals], dtype=object
                )
            m = np.stack(vals).astype(np.float64)  # (rows, dim)
            bits = (m @ planes_t) >= 0.0  # (rows, n_bits)
            codes = bits.reshape(len(m), n_bands, band_bits).astype(np.int64) @ weights
            # NULL vector → code 0 in every band (what the SQL oracle's
            # CASE WHEN NULL-dot ELSE 0 computes): nulls co-bucket and
            # their null cosine is filtered downstream
            codes[null_mask] = 0
            yield pd.Series(list(codes))

    return band_codes


def _with_bands(df: DataFrame, vec_col: str, dim: int, n_bands: int, band_bits: int, seed: int) -> DataFrame:
    codes = _band_codes_udf(dim, n_bands, band_bits, seed)
    # posexplode the UDF call inside ONE generate operator: a staged
    # intermediate column would let projection collapse inline (and
    # evaluate) the Arrow UDF twice in the physical plan
    return df.select("*", F.posexplode(codes(F.col(vec_col))).alias("band", "code"))


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
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, sim) pairs with sim ≥ threshold, id_a < id_b —
    LSH-bucketed candidate generation + exact verify.

    ``max_bucket``: drop band buckets larger than this before the
    self-join (the minhash-style hot-key guard — a degenerate embedding
    cluster, e.g. near-zero vectors, otherwise makes one bucket
    quadratic). Affected vectors still pair through their other bands.
    Default None = exact LSH semantics (what the driver oracle replays).
    """
    banded = _with_bands(
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        "_vec", dim, n_bands, band_bits, seed,
    )
    if max_bucket is not None:
        sizes = banded.groupBy("band", "code").agg(F.count(F.lit(1)).alias("n"))
        banded = banded.join(
            sizes.filter(F.col("n") <= max_bucket).select("band", "code"),
            ["band", "code"],
            "left_semi",
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


class LshIndex:
    """Persisted LSH index: the banded corpus signature table, staged ONCE.

    The reference builds its ANN index once in Milvus and serves many
    query batches against it (initializer.py:208-244); the Spark analog
    is this staged table — ``(corpus_id, vector, band, code)`` written to
    parquet pre-partitioned on the join key — so repeated ``topk`` calls
    never recompute corpus signatures (plan reads the staged scan only).

    At cluster scale, stage into a bucketed table (``bucketBy(band,
    code)`` + ``saveAsTable``) to also skip the corpus-side shuffle per
    query batch; plain parquet keeps this sandbox path warehouse-free.
    """

    def __init__(
        self,
        spark,
        path: str,
        dim: int,
        n_bands: int = 8,
        band_bits: int = 8,
        seed: int = 42,
        corpus_id: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.path = path
        self.dim = dim
        self.n_bands = n_bands
        self.band_bits = band_bits
        self.seed = seed
        self.corpus_id = corpus_id
        self.vec_col = vec_col

    def build(self, corpus: DataFrame) -> None:
        """One pass over the corpus: compute band codes, stage to disk."""
        banded = _with_bands(
            corpus.select(F.col(self.corpus_id), F.col(self.vec_col).alias("_cvec")),
            "_cvec", self.dim, self.n_bands, self.band_bits, self.seed,
        )
        banded.repartition("band", "code").write.mode("overwrite").parquet(self.path)

    def _staged(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def topk(self, queries: DataFrame, k: int = 10, query_id: str = "query_id") -> DataFrame:
        """Approximate top-k against the staged index — only the (small)
        query side computes signatures; the corpus side is a plain scan."""
        q = _with_bands(
            queries.select(F.col(query_id), F.col(self.vec_col).alias("_qvec")),
            "_qvec", self.dim, self.n_bands, self.band_bits, self.seed,
        )
        candidates = (
            self._staged()
            .join(q, ["band", "code"])
            .select(query_id, self.corpus_id, "_qvec", "_cvec")
            .dropDuplicates([query_id, self.corpus_id])
        )
        scored = candidates.select(
            query_id, self.corpus_id,
            cosine_expr(F.col("_qvec"), F.col("_cvec")).alias("sim"),
        )
        w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(self.corpus_id))
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= F.lit(k)
        )
