"""Hashed Weisfeiler-Lehman refinement vs a pure-Python replay and the
structural invariants WL classes must satisfy."""

from __future__ import annotations

import random

from plwordnet_spark.graph.wl import WL_A, WL_B, WL_C, WL_P, wl_labels


def _py_wl(edge_list, iterations, directed=False):
    adj: dict[int, list[int]] = {}
    es = set()
    for u, v in edge_list:
        if u == v:
            continue
        es.add((u, v))
        if not directed:
            es.add((v, u))
    for u, v in es:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, [])
    lab = {n: 1 for n in adj}
    for _ in range(iterations):
        nxt = {}
        for n in adj:
            s = sum((WL_B * lab[m] + WL_C) % WL_P for m in adj[n]) % WL_P
            nxt[n] = (WL_A * lab[n] + s) % WL_P
        lab = nxt
    return lab


def _spark_wl(spark, edge_list, iterations, **kw):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["id"]: r["label"]
        for r in wl_labels(spark, df, iterations=iterations, **kw).collect()
    }


class TestWlLabels:
    def test_matches_python_replay(self, spark):
        rng = random.Random(5)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
        edges = [(u, v) for u, v in edges if u != v]
        for it in (1, 3):
            assert _spark_wl(spark, edges, it) == _py_wl(edges, it)

    def test_directed_matches_python(self, spark):
        rng = random.Random(6)
        edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(50)]
        edges = [(u, v) for u, v in edges if u != v]
        assert _spark_wl(spark, edges, 2, directed=True) == _py_wl(
            edges, 2, directed=True
        )

    def test_regular_graph_stays_monochrome(self, spark):
        # a cycle is vertex-transitive: WL can never split it
        n = 8
        edges = [(i, (i + 1) % n) for i in range(n)]
        labs = _spark_wl(spark, edges, 4)
        assert len(set(labs.values())) == 1

    def test_star_splits_center_from_leaves(self, spark):
        edges = [(0, i) for i in range(1, 6)]
        labs = _spark_wl(spark, edges, 1)
        assert len({labs[i] for i in range(1, 6)}) == 1
        assert labs[0] != labs[1]

    def test_isomorphic_components_get_equal_label_multisets(self, spark):
        # path a-b-c twice, disjoint ids: same sorted label list
        edges = [(0, 1), (1, 2), (10, 11), (11, 12)]
        labs = _spark_wl(spark, edges, 3)
        assert sorted(labs[i] for i in (0, 1, 2)) == sorted(
            labs[i] for i in (10, 11, 12)
        )
