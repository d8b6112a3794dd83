"""Round-5 additions, batch 3: SALSA and backlink host diversity."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from plwordnet_spark.graph.hostgraph import backlink_diversity
from plwordnet_spark.graph.salsa import salsa


def _py_salsa(edges, iters):
    links = sorted({e for e in edges if e[0] != e[1]})
    nodes = sorted({u for e in links for u in e})
    n = len(nodes)
    ind, outd = defaultdict(int), defaultdict(int)
    for s, d in links:
        outd[s] += 1
        ind[d] += 1
    a = {v: 1.0 / n for v in nodes}
    h = {v: 1.0 / n for v in nodes}

    def l1(x):
        s = sum(abs(v) for v in x.values())
        return {k: (v / s if s > 0 else 0.0) for k, v in x.items()}

    for _ in range(iters):
        b = defaultdict(float)
        for s, d in links:
            b[s] += a[d] / ind[d]
        a2 = {v: 0.0 for v in nodes}
        for s, d in links:
            a2[d] += b[s] / outd[s]
        c = defaultdict(float)
        for s, d in links:
            c[d] += h[s] / outd[s]
        h2 = {v: 0.0 for v in nodes}
        for s, d in links:
            h2[s] += c[d] / ind[d]
        a, h = l1(a2), l1(h2)
    return a, h


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2), (5, 1), (2, 5), (6, 1),
]


def test_salsa_matches_pure_python(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    res = salsa(spark, df, tol=0.0, max_iterations=12)
    got = {r["id"]: (r["authority"], r["hub"]) for r in res.state.collect()}
    a, h = _py_salsa(EDGES, 12)
    assert set(got) == set(a)
    for v in a:
        assert got[v][0] == pytest.approx(a[v], abs=1e-12)
        assert got[v][1] == pytest.approx(h[v], abs=1e-12)


def test_salsa_authority_stationary_is_indegree_proportional(spark):
    # strongly-connected-support graph: authority chain irreducible →
    # stationary authority ∝ in-degree (Lempel-Moran Prop. 2)
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (2, 1), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = salsa(spark, df, tol=1e-12, max_iterations=200)
    got = {r["id"]: r["authority"] for r in res.state.collect()}
    ind = defaultdict(int)
    for _, d in edges:
        ind[d] += 1
    total = sum(ind.values())
    for v, deg in ind.items():
        assert got[v] == pytest.approx(deg / total, abs=1e-9)
    assert res.converged


def test_backlink_diversity(spark):
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10), (1, 20), (2, 20)],
        "src long, dst long",
    )
    hosts = spark.createDataFrame(
        [(1, "a.com"), (2, "a.com"), (3, "b.com"), (4, "c.com")],
        "id long, host string",
    )
    got = {
        r["dst"]: (r["n_backlinks"], r["n_src_hosts"], r["host_diversity"])
        for r in backlink_diversity(edges, hosts).collect()
    }
    assert got[10] == (4, 3, pytest.approx(0.75))
    assert got[20] == (2, 1, pytest.approx(0.5))
