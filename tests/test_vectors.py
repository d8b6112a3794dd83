"""Vector pooling + similarity vs numpy oracles (strategy.py:21-99 and
similar_search_handler.py semantics, exact instead of ANN)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from plwordnet_spark.vectors.hash_embed import hash_embedding
from plwordnet_spark.vectors.pooling import mean_pool, weighted_mean_pool
from plwordnet_spark.vectors.similarity import cosine_topk, cosine_pairs, lsh_bucketed_topk

DIM = 16
RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def vec_data():
    groups = np.repeat(np.arange(10), 5)
    vecs = RNG.normal(size=(50, DIM))
    weights = RNG.uniform(1.0, 3.0, size=50)
    return groups, vecs, weights


def _df(spark, groups, vecs, weights):
    rows = [
        (int(g), [float(x) for x in v], float(w))
        for g, v, w in zip(groups, vecs, weights)
    ]
    return spark.createDataFrame(
        rows, "group_id long, embedding array<double>, weight double"
    )


def test_mean_pool_matches_numpy(spark, vec_data):
    groups, vecs, weights = vec_data
    df = _df(spark, groups, vecs, weights)
    got = {r.group_id: np.array(r.embedding) for r in mean_pool(df, ["group_id"]).collect()}
    for g in np.unique(groups):
        expected = vecs[groups == g].mean(axis=0)
        assert np.allclose(got[int(g)], expected, atol=1e-12)


def test_weighted_mean_pool_matches_numpy(spark, vec_data):
    groups, vecs, weights = vec_data
    df = _df(spark, groups, vecs, weights)
    out = weighted_mean_pool(df, ["group_id"], normalize=True)
    got = {r.group_id: np.array(r.embedding) for r in out.collect()}
    for g in np.unique(groups):
        mask = groups == g
        expected = (vecs[mask] * weights[mask, None]).sum(axis=0) / weights[mask].sum()
        expected = expected / np.linalg.norm(expected)
        assert np.allclose(got[int(g)], expected, atol=1e-12)


def test_cosine_topk_exact(spark):
    corpus_vecs = RNG.normal(size=(200, DIM))
    query_vecs = RNG.normal(size=(5, DIM))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus_vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(query_vecs)],
        "query_id long, embedding array<double>",
    )
    got = cosine_topk(corpus, queries, k=10).collect()
    by_query: dict = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.sim))
    cn = corpus_vecs / np.linalg.norm(corpus_vecs, axis=1, keepdims=True)
    qn = query_vecs / np.linalg.norm(query_vecs, axis=1, keepdims=True)
    sims = qn @ cn.T
    for qid, rows in by_query.items():
        rows.sort()
        expected_order = np.argsort(-sims[qid], kind="stable")[:10]
        got_ids = [vid for _, vid, _ in rows]
        assert got_ids == [int(i) for i in expected_order]
        for _, vid, sim in rows:
            assert abs(sim - sims[qid][vid]) < 1e-9


def test_lsh_topk_recall(spark):
    # clustered corpus: 20 clusters of 10 near-identical vectors
    centers = RNG.normal(size=(20, DIM)) * 4
    corpus_vecs = np.concatenate(
        [c + RNG.normal(scale=0.05, size=(10, DIM)) for c in centers]
    )
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus_vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in centers[i]]) for i in range(5)],
        "query_id long, embedding array<double>",
    )
    exact = cosine_topk(corpus, queries, k=5).collect()
    approx = lsh_bucketed_topk(corpus, queries, dim=DIM, k=5, n_bands=8, band_bits=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8  # clustered data, generous bands


def test_cosine_pairs_near_dup(spark):
    base = RNG.normal(size=DIM)
    vecs = [base + RNG.normal(scale=0.01, size=DIM) for _ in range(3)]
    vecs += [RNG.normal(size=DIM) for _ in range(20)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    pairs = cosine_pairs(df, dim=DIM, threshold=0.98, n_bands=8, band_bits=4).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert {(0, 1), (0, 2), (1, 2)} <= found


def test_hash_embedding_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("xyz",)], "t string")
    out = df.select(hash_embedding(F.col("t"), dim=8).alias("e")).collect()
    assert out[0].e == out[1].e
    assert out[0].e != out[2].e
    assert abs(sum(x * x for x in out[0].e) - 1.0) < 1e-9


def test_driver_embeddings_table(spark, sf_dir):
    """Pooling runs on the driver-provided embeddings table."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pooled = mean_pool(
        emb.select(F.col("label").alias("group_id"), F.col("embedding").cast("array<double>").alias("embedding")),
        ["group_id"],
    )
    rows = pooled.collect()
    assert len(rows) == emb.select("label").distinct().count()
