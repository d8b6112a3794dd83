"""IVF approximate nearest-neighbor: quantizer determinism, full-probe
equivalence to brute force, and recall at partial probe on clustered
data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from plwordnet_spark.vectors.ivf import (
    IvfIndex,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
)
from plwordnet_spark.vectors.similarity import cosine_topk


def _clustered_corpus(spark, n_clusters=4, per_cluster=50, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + 0.15 * rng.normal(size=(per_cluster, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def corpus(spark):
    df = _clustered_corpus(spark).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def index(spark, corpus):
    cents = kmeans_centroids(corpus, n_centroids=8, max_iters=4)
    return IvfIndex(centroids=cents, corpus=ivf_assign(corpus, cents))


class TestKmeans:
    def test_deterministic(self, spark, corpus):
        a = kmeans_centroids(corpus, n_centroids=4, max_iters=3).collect()
        b = kmeans_centroids(corpus, n_centroids=4, max_iters=3).collect()
        assert sorted(r["bucket"] for r in a) == [0, 1, 2, 3]
        am = {r["bucket"]: r["centroid"] for r in a}
        bm = {r["bucket"]: r["centroid"] for r in b}
        for k in am:
            assert am[k] == bm[k]

    def test_centroids_unit_norm(self, spark, corpus):
        for r in kmeans_centroids(corpus, n_centroids=4, max_iters=2).collect():
            assert np.linalg.norm(r["centroid"]) == pytest.approx(1.0, abs=1e-9)

    def test_matches_numpy_lloyd_replay(self, spark, corpus):
        # iteration-exact parity with a pure-numpy spherical Lloyd:
        # same init (k smallest ids), same (score desc, bucket asc)
        # tie-break, same empty-bucket keep-old rule
        k, iters = 6, 3
        rows = sorted(corpus.collect(), key=lambda r: r["vec_id"])
        ids = np.array([r["vec_id"] for r in rows])
        X = np.array([r["embedding"] for r in rows], dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        C = X[np.argsort(ids)[:k]].copy()
        for _ in range(iters):
            assign = np.argmax(X @ C.T, axis=1)  # argmax takes first max
            for b in range(k):
                members = X[assign == b]
                if len(members):
                    m = members.mean(axis=0)
                    C[b] = m / np.linalg.norm(m)
        expected = dict(zip(ids.tolist(), np.argmax(X @ C.T, axis=1).tolist()))

        cents = kmeans_centroids(corpus, n_centroids=k, max_iters=iters)
        got = {
            r["vec_id"]: r["bucket"]
            for r in ivf_assign(corpus, cents).select("vec_id", "bucket").collect()
        }
        assert got == expected

    def test_degenerate_duplicate_corpus(self, spark):
        # all-identical vectors: every point lands in bucket 0, empty
        # buckets keep their init centroid, search still returns top-k
        df = spark.createDataFrame(
            [(i, [1.0, 0.0, 0.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        cents = kmeans_centroids(df, n_centroids=4, max_iters=2)
        assert cents.count() == 4
        idx = IvfIndex(centroids=cents, corpus=ivf_assign(df, cents))
        q = df.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
        got = ivf_topk(idx, q, k=5, nprobe=1).collect()
        assert len(got) == 5


class TestSearch:
    def test_full_probe_equals_brute_force(self, spark, corpus, index):
        qs = corpus.filter(F.col("vec_id") % 37 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = cosine_topk(corpus, qs, k=10)
        approx = ivf_topk(index, qs, k=10, nprobe=8)
        e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
        a = {(r["query_id"], r["rank"]): r["vec_id"] for r in approx.collect()}
        assert e == a
        # sims agree numerically despite normalize-then-dot vs dot/norms
        es = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact.collect()}
        for r in ivf_topk(index, qs, k=10, nprobe=8).collect():
            assert es[(r["query_id"], r["vec_id"])] == pytest.approx(
                r["sim"], abs=1e-9
            )

    def test_partial_probe_recall_on_clustered_data(self, spark, corpus, index):
        qs = corpus.filter(F.col("vec_id") % 13 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = cosine_topk(corpus, qs, k=10)
        approx = ivf_topk(index, qs, k=10, nprobe=2)
        e: dict[int, set[int]] = {}
        for r in exact.collect():
            e.setdefault(r["query_id"], set()).add(r["vec_id"])
        a: dict[int, set[int]] = {}
        for r in approx.collect():
            a.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
        # 4 well-separated clusters, 8 buckets, nprobe=2: the probed
        # buckets cover the query's own cluster almost always
        assert sum(recalls) / len(recalls) >= 0.8

    def test_probe_reduces_candidates(self, spark, corpus, index):
        # structural evidence of the work reduction: candidate rows
        # scored at nprobe=1 are a strict subset of the corpus
        qs = corpus.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
        n_corpus = corpus.count()
        probed_bucket_rows = (
            index.corpus.groupBy("bucket").count().orderBy(F.desc("count")).first()
        )
        assert probed_bucket_rows["count"] < n_corpus


class TestSemDedup:
    def test_planted_near_duplicates_pair_up(self, spark):
        from plwordnet_spark.vectors.ivf import semdedup_pairs

        rng = np.random.default_rng(3)
        base = rng.normal(size=(40, 16))
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
        # plant near-dups: 100+i is 0..4 plus tiny noise (same cluster,
        # cosine ~ 1)
        for i in range(5):
            dup = base[i] + 0.01 * rng.normal(size=16)
            rows.append((100 + i, [float(x) for x in dup]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            (r["id_a"], r["id_b"])
            for r in semdedup_pairs(
                df, n_centroids=4, max_iters=3, threshold=0.98
            ).collect()
        }
        assert {(i, 100 + i) for i in range(5)} <= got
        # random 16-d gaussians never hit 0.98
        assert got == {(i, 100 + i) for i in range(5)}

    def test_matches_bruteforce_within_clusters(self, spark, corpus):
        from plwordnet_spark.vectors.ivf import (
            ivf_assign,
            kmeans_centroids,
            semdedup_pairs,
        )

        t = 0.9
        cents = kmeans_centroids(corpus, n_centroids=6, max_iters=2)
        assign = {
            r["vec_id"]: r["bucket"]
            for r in ivf_assign(corpus, cents).collect()
        }
        vecs = {
            r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()
        }
        for k in vecs:
            vecs[k] = vecs[k] / np.linalg.norm(vecs[k])
        ids = sorted(vecs)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if assign[a] == assign[b] and float(vecs[a] @ vecs[b]) >= t
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in semdedup_pairs(
                corpus, n_centroids=6, max_iters=2, threshold=t
            ).collect()
        }
        assert got == want
        assert want  # clustered corpus: some true semantic dups exist
