"""Round-5 additions, batch 5: eigenvector centrality + JSON props query."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from plwordnet_spark.graph.centrality import eigenvector_centrality


def _py_eigenvector(edges, iters):
    links = sorted({e for e in edges if e[0] != e[1]})
    nodes = sorted({u for e in links for u in e})
    x = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(iters):
        raw = {v: 0.0 for v in nodes}
        for s, d in links:
            raw[d] += x[s] * 1.0
        n2 = math.sqrt(sum(v * v for v in raw.values()))
        x = {k: (v / n2 if n2 > 0 else 0.0) for k, v in raw.items()}
    return x


EDGES = [
    (1, 2), (2, 3), (3, 1), (1, 3), (3, 2), (2, 1), (4, 1), (4, 2), (1, 4),
]


def test_eigenvector_matches_pure_python_fixed_k(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    res = eigenvector_centrality(spark, df, tol=0.0, max_iterations=15)
    got = {r["id"]: r["score"] for r in res.state.collect()}
    want = _py_eigenvector(EDGES, 15)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_eigenvector_matches_networkx_at_convergence(spark):
    nx = pytest.importorskip("networkx")
    df = spark.createDataFrame(EDGES, "src long, dst long")
    res = eigenvector_centrality(spark, df, tol=1e-12, max_iterations=500)
    assert res.converged
    got = {r["id"]: r["score"] for r in res.state.collect()}
    g = nx.DiGraph()
    g.add_edges_from(EDGES)
    want = nx.eigenvector_centrality(g, max_iter=2000, tol=1e-12)
    # both L2-normalized dominant eigenvectors of A^T
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_eigenvector_weighted_and_empty(spark):
    df = spark.createDataFrame(
        [(1, 2, 3.0), (2, 1, 1.0)], "src long, dst long, weight double"
    )
    res = eigenvector_centrality(spark, df, tol=0.0, max_iterations=40, weighted=True)
    got = {r["id"]: r["score"] for r in res.state.collect()}
    # 2-cycle with asymmetric weights: verify against an exact replay
    x = {1: 0.5, 2: 0.5}
    for _ in range(40):
        nraw = {1: x[2] * 1.0, 2: x[1] * 3.0}
        nn = math.sqrt(sum(v * v for v in nraw.values()))
        x = {k: v / nn for k, v in nraw.items()}
    for v in x:
        assert got[v] == pytest.approx(x[v], abs=1e-12)
    empty = spark.createDataFrame([], "src long, dst long")
    res0 = eigenvector_centrality(spark, empty)
    assert res0.state.count() == 0 and res0.converged


def test_json_props_parse(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    parsed = events.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    row = parsed.filter(F.col("k").isNull()).count()
    assert row == 0  # every props row parses
    import json as _json

    sample = events.select("props").limit(50).collect()
    ks = parsed.limit(50).collect()
    for r_raw, r_parsed in zip(sample, ks):
        assert _json.loads(r_raw["props"])["k"] == r_parsed["k"]
