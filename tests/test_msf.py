"""Borůvka minimum spanning forest vs networkx (unique-MSF property)."""

from __future__ import annotations

import networkx as nx
import pytest


def _nx_msf(edges):
    g = nx.Graph()
    for u, v, w in edges:
        if u == v:
            continue
        if g.has_edge(u, v):
            w = min(w, g[u][v]["weight"])
        g.add_edge(u, v, weight=w)
    return {
        (min(u, v), max(u, v), d["weight"])
        for u, v, d in nx.minimum_spanning_edges(g, data=True)
    }


def _got(spark, edges, **kw):
    from plwordnet_spark.graph.msf import minimum_spanning_forest

    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    return {
        (r.a, r.b, r.w)
        for r in minimum_spanning_forest(spark, df, **kw).collect()
    }


def test_msf_matches_networkx_random(spark):
    # deterministic pseudo-random graph, distinct weights
    edges = []
    wset = set()
    for i in range(160):
        u, v = (i * 37) % 40, (i * 53 + 11) % 40
        if u == v:
            continue
        w = float(((u * 41 + v) * 1103515245) % 104729)
        if w in wset:
            continue
        wset.add(w)
        edges.append((u, v, w))
    assert _got(spark, edges) == _nx_msf(edges)


def test_msf_multiple_components_and_parallel_edges(spark):
    edges = [
        # component 1: triangle, MSF keeps the two lightest
        (0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0),
        # parallel edge collapsed to its min before selection
        (1, 0, 0.5),
        # component 2: single edge + self loop dropped
        (10, 11, 7.0), (10, 10, 0.1),
    ]
    got = _got(spark, edges)
    assert got == {(0, 1, 0.5), (1, 2, 2.0), (10, 11, 7.0)}


def test_msf_path_graph_merges_in_one_round(spark):
    # a path picks every edge in round one — the chain-merge case that
    # breaks naive hash-min contraction; total = all path edges
    edges = [(i, i + 1, float(100 - i)) for i in range(30)]
    got = _got(spark, edges)
    assert got == {(i, i + 1, float(100 - i)) for i in range(30)}


def test_msf_empty_and_single_edge(spark):
    assert _got(spark, [(1, 2, 5.0)]) == {(1, 2, 5.0)}
    from plwordnet_spark.graph.msf import minimum_spanning_forest

    empty = spark.createDataFrame([], "src long, dst long, w double")
    assert minimum_spanning_forest(spark, empty).count() == 0
