"""Harmonic / closeness centrality vs networkx (round 5).

Exact mode (all-sources composite BFS) must match networkx on random
graphs including disconnected ones; sampled mode must equal exact
restricted to the sampled sources (it is the same job shape).
"""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from plwordnet_spark.graph.centrality import (
    closeness_centrality,
    harmonic_centrality,
)


def _random_edges(spark, seed=7, n=40, m=120):
    rng = np.random.RandomState(seed)
    pairs = {
        (int(a), int(b))
        for a, b in rng.randint(0, n, size=(m, 2))
        if a != b
    }
    return spark.createDataFrame(sorted(pairs), "src long, dst long"), pairs


def test_harmonic_matches_networkx_undirected(spark):
    edges, pairs = _random_edges(spark)
    g = nx.Graph(list(pairs))
    want = nx.harmonic_centrality(g)
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(spark, edges).collect()}
    assert set(got) == {k for k, v in want.items() if v > 0}
    for k, v in got.items():
        assert abs(v - want[k]) < 1e-9, k


def test_harmonic_matches_networkx_directed(spark):
    edges, pairs = _random_edges(spark, seed=11)
    g = nx.DiGraph(list(pairs))
    # networkx harmonic uses INCOMING distances d(u, v); our directed
    # flood follows edge direction from each source, giving exactly that
    want = nx.harmonic_centrality(g)
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, directed=True).collect()
    }
    for k, v in got.items():
        assert abs(v - want[k]) < 1e-9, k
    # nodes with zero harmonic (no in-paths) are simply absent
    assert all(want.get(k, 0) == 0 for k in set(want) - set(got))


def test_closeness_matches_networkx_disconnected(spark):
    # two components: a path and a triangle
    edge_list = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 10)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    g = nx.Graph(edge_list)
    want = nx.closeness_centrality(g, wf_improved=True)
    got = {
        r["id"]: r["closeness"]
        for r in closeness_centrality(spark, edges).collect()
    }
    for k, v in got.items():
        assert abs(v - want[k]) < 1e-9, k


def test_sampled_sources_equal_exact_restriction(spark):
    edges, pairs = _random_edges(spark, seed=13)
    g = nx.Graph(list(pairs))
    sample = [0, 3, 9, 17]
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, sources=sample).collect()
    }
    for node, val in got.items():
        want = sum(
            1.0 / nx.shortest_path_length(g, s, node)
            for s in sample
            if s != node and nx.has_path(g, s, node)
        )
        assert abs(val - want) < 1e-9, node


def test_harmonic_scale_factor(spark):
    edges, _ = _random_edges(spark, seed=17)
    base = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, sources=[0, 5]).collect()
    }
    scaled = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges, sources=[0, 5], scale=3.0).collect()
    }
    assert scaled.keys() == base.keys()
    for k in base:
        assert abs(scaled[k] - 3.0 * base[k]) < 1e-9


def test_betweenness_matches_networkx_directed(spark):
    from plwordnet_spark.graph.centrality import betweenness_centrality

    edges, pairs = _random_edges(spark, seed=11, n=25, m=90)
    exp = nx.betweenness_centrality(nx.DiGraph(sorted(pairs)), normalized=False)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(spark, edges, directed=True).collect()
    }
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_betweenness_matches_networkx_undirected(spark):
    from plwordnet_spark.graph.centrality import betweenness_centrality

    edges, pairs = _random_edges(spark, seed=13, n=20, m=50)
    exp = nx.betweenness_centrality(nx.Graph(sorted(pairs)), normalized=False)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(spark, edges, directed=False).collect()
    }
    # undirected networkx halves pair contributions (each unordered pair
    # counted once); the engine counts ordered pairs — exact factor 2
    for k, v in exp.items():
        assert got[k] == pytest.approx(2.0 * v, abs=1e-9)


def test_betweenness_sampled_sources_partial_sums(spark):
    from plwordnet_spark.graph.centrality import betweenness_centrality

    edges, pairs = _random_edges(spark, seed=17, n=20, m=60)
    G = nx.DiGraph(sorted(pairs))
    srcs = sorted(G.nodes)[::3]
    # brandes restricted to a source subset == sum of per-source deltas
    exp: dict[int, float] = {v: 0.0 for v in G.nodes}
    for s in srcs:
        d = nx.algorithms.centrality.betweenness_centrality_subset(
            G, sources=[s], targets=list(G.nodes), normalized=False
        )
        for v, x in d.items():
            exp[v] += x
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            spark, edges, sources=[int(s) for s in srcs], directed=True
        ).collect()
    }
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_betweenness_path_graph_closed_form(spark):
    from plwordnet_spark.graph.centrality import betweenness_centrality

    # directed path 0→1→2→3→4: interior node k lies on (k)·(n−1−k) paths
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(spark, edges, directed=True).collect()
    }
    assert got == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}


class TestEccentricity:
    def test_matches_networkx(self, spark):
        import random

        rng = random.Random(17)
        while True:
            edges = [
                (rng.randrange(15), rng.randrange(15)) for _ in range(25)
            ]
            edges = [(u, v) for u, v in edges if u != v]
            g = nx.Graph(edges)
            if nx.is_connected(g):
                break
        from plwordnet_spark.graph.centrality import eccentricity

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["id"]: r["ecc"]
            for r in eccentricity(spark, df).collect()
        }
        assert got == nx.eccentricity(g)

    def test_radius_diameter_summary(self, spark):
        # path 0-1-2-3-4: radius 2 (center {2}), diameter 4 (ends)
        edges = [(i, i + 1) for i in range(4)]
        from plwordnet_spark.graph.centrality import radius_diameter

        df = spark.createDataFrame(edges, "src long, dst long")
        r = radius_diameter(spark, df).first()
        assert (r["radius"], r["diameter"], r["n_center"], r["n_periphery"]) == (
            2, 4, 1, 2,
        )
