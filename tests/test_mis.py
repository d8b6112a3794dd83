"""Maximal independent set: structural properties + exact replay parity
against a pure-python implementation of the same deterministic rounds."""

from __future__ import annotations

import numpy as np

from plwordnet_spark.graph.mis import MIS_A, MIS_B, MIS_P, maximal_independent_set


def _random_edges(spark, seed=23, n=60, m=180):
    rng = np.random.RandomState(seed)
    pairs = {
        (int(a), int(b)) for a, b in rng.randint(0, n, size=(m, 2)) if a != b
    }
    return spark.createDataFrame(sorted(pairs), "src long, dst long"), pairs


def _python_mis(pairs, seed=17):
    adj: dict[int, set[int]] = {}
    nodes = set()
    for a, b in pairs:
        nodes.update((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(nodes)
    out = {}
    r = 1
    while active:
        p = {v: ((v % MIS_P) * MIS_A + r * MIS_B + seed) % MIS_P for v in active}
        win = {
            v
            for v in active
            if all((p[v], v) < (p[w], w) for w in adj.get(v, ()) if w in active)
        }
        for v in win:
            out[v] = r
        dead = set(win)
        for v in win:
            dead |= adj.get(v, set())
        active -= dead
        r += 1
    return out


def test_mis_matches_pure_python_replay(spark):
    edges, pairs = _random_edges(spark)
    got = {
        r["id"]: r["mis_round"]
        for r in maximal_independent_set(spark, edges).collect()
    }
    assert got == _python_mis(pairs)


def test_mis_is_independent_and_maximal(spark):
    edges, pairs = _random_edges(spark, seed=29, n=40, m=100)
    mis = {r["id"] for r in maximal_independent_set(spark, edges).collect()}
    und = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    # independence: no edge with both endpoints inside
    assert not any(a in mis and b in mis for a, b in und)
    # maximality: every outside vertex has a MIS neighbour
    nodes = {x for e in pairs for x in e}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    for v in nodes - mis:
        assert adj.get(v, set()) & mis, f"vertex {v} could join the MIS"


def test_mis_isolated_and_self_loop_nodes_join_round_one(spark):
    edges = spark.createDataFrame(
        [(1, 1), (2, 3)], "src long, dst long"
    )
    got = {
        r["id"]: r["mis_round"]
        for r in maximal_independent_set(spark, edges).collect()
    }
    # node 1 (self-loop only) is independent; exactly one of {2, 3} wins
    assert got[1] == 1
    assert len({2, 3} & set(got)) == 1


class TestGreedyColoring:
    def _color(self, spark, edges, **kw):
        from plwordnet_spark.graph.mis import greedy_coloring

        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["id"]: r["color"]
            for r in greedy_coloring(spark, df, **kw).collect()
        }

    def test_proper_and_bounded_on_random_graph(self, spark):
        import random
        from collections import defaultdict

        rng = random.Random(21)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(70)]
        edges = [(u, v) for u, v in edges if u != v]
        got = self._color(spark, edges)
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        # proper: no adjacent pair shares a color
        for u, v in edges:
            assert got[u] != got[v]
        # every node colored; at most max-degree + 1 colors
        assert set(got) == set(adj)
        assert max(got.values()) <= max(len(s) for s in adj.values())

    def test_deterministic(self, spark):
        edges = [(i, (i + 1) % 9) for i in range(9)]
        a = self._color(spark, edges, seed=3)
        b = self._color(spark, edges, seed=3)
        assert a == b

    def test_bipartite_uses_two_colors_on_star(self, spark):
        edges = [(0, i) for i in range(1, 8)]
        got = self._color(spark, edges)
        assert len(set(got.values())) == 2
        assert len({got[i] for i in range(1, 8)}) == 1
        assert got[0] != got[1]
