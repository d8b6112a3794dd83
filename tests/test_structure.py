"""Web-graph macro-structure: reciprocity, assortativity, SCC, bow-tie,
HyperBall neighborhood function.

SCC is cross-checked against an in-test iterative Tarjan on randomized
graphs; the neighborhood function against exact BFS ball sizes.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from plwordnet_spark.graph.structure import (
    bowtie,
    degree_assortativity,
    neighborhood_function,
    reciprocity,
    strongly_connected_components,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _tarjan_scc(pairs):
    """Iterative Tarjan; returns {node: min_id_of_its_scc}."""
    adj: dict[int, list[int]] = {}
    nodes = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        nodes.add(a)
        nodes.add(b)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    result = {}
    counter = [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, iter(adj.get(root, [])))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, []))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
    return result


class TestReciprocity:
    def test_half_reciprocal(self, spark):
        # 1<->2 reciprocal, 3->4 not
        row = reciprocity(_edges_df(spark, [(1, 2), (2, 1), (3, 4)])).first()
        assert row["n_edges"] == 3
        assert row["n_reciprocal"] == 2
        assert row["reciprocity"] == pytest.approx(2 / 3)

    def test_dedup_and_loops_ignored(self, spark):
        row = reciprocity(
            _edges_df(spark, [(1, 2), (1, 2), (2, 1), (5, 5)])
        ).first()
        assert row["n_edges"] == 2 and row["n_reciprocal"] == 2
        assert row["reciprocity"] == 1.0


class TestAssortativity:
    def test_matches_manual_pearson(self, spark):
        pairs = [(1, 2), (1, 3), (2, 3), (4, 3), (4, 2), (3, 1)]
        out_deg = {}
        in_deg = {}
        for a, b in pairs:
            out_deg[a] = out_deg.get(a, 0) + 1
            in_deg[b] = in_deg.get(b, 0) + 1
        xs = [out_deg[a] for a, b in pairs]
        ys = [in_deg[b] for a, b in pairs]
        n = len(pairs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        vx = sum((x - mx) ** 2 for x in xs)
        vy = sum((y - my) ** 2 for y in ys)
        expected = cov / (vx**0.5 * vy**0.5)
        row = degree_assortativity(_edges_df(spark, pairs)).first()
        assert row["n_edges"] == n
        assert row["assortativity"] == pytest.approx(expected, abs=1e-6)


class TestSCC:
    def test_two_cycles_and_bridge(self, spark):
        # cycle {1,2,3} -> bridge -> cycle {10,11}; 20 dangling
        pairs = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10), (11, 20)]
        got = {
            r["id"]: r["component"]
            for r in strongly_connected_components(
                spark, _edges_df(spark, pairs)
            ).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}

    def test_pure_dag_all_singletons(self, spark):
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        got = {
            r["id"]: r["component"]
            for r in strongly_connected_components(
                spark, _edges_df(spark, pairs)
            ).collect()
        }
        assert got == {i: i for i in (1, 2, 3, 4)}

    def test_directed_path_needs_phases_not_trim_only(self, spark):
        # path 0->1->...->8 with one back-edge 8->4: SCC {4..8} + singles
        pairs = [(i, i + 1) for i in range(8)] + [(8, 4)]
        got = {
            r["id"]: r["component"]
            for r in strongly_connected_components(
                spark, _edges_df(spark, pairs)
            ).collect()
        }
        expected = _tarjan_scc(pairs)
        assert got == expected

    def test_random_vs_tarjan(self, spark):
        rng = random.Random(7)
        n = 60
        pairs = list(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(180)}
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        got = {
            r["id"]: r["component"]
            for r in strongly_connected_components(
                spark, _edges_df(spark, pairs)
            ).collect()
        }
        assert got == _tarjan_scc(pairs)


class TestBowtie:
    def test_textbook_bowtie(self, spark):
        # IN: 100->1, 101->2 ; CORE: cycle 1-2-3 ; OUT: 3->200, 200->201
        # TENDRIL: 100->300 (from IN, never reaches core/OUT)
        # DISCONNECTED: 400<->401
        pairs = [
            (100, 1), (101, 2),
            (1, 2), (2, 3), (3, 1),
            (3, 200), (200, 201),
            (100, 300),
            (400, 401), (401, 400),
        ]
        got = {
            r["id"]: r["region"]
            for r in bowtie(spark, _edges_df(spark, pairs)).collect()
        }
        assert got == {
            1: "CORE", 2: "CORE", 3: "CORE",
            100: "IN", 101: "IN",
            200: "OUT", 201: "OUT",
            300: "TENDRIL",
            400: "DISCONNECTED", 401: "DISCONNECTED",
        }


class TestNeighborhoodFunction:
    def test_exact_on_small_graph(self, spark):
        rng = random.Random(3)
        n = 40
        pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(80)})
        pairs = [(a, b) for a, b in pairs if a != b]

        # exact N(t): ball(v,t+1) = ball(v,t) ∪ ⋃_{v->w} ball(w,t),
        # iterated over a frozen snapshot of the previous generation
        adj: dict[int, set[int]] = {}
        nodes = set()
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            nodes.add(a)
            nodes.add(b)
        balls = {v: {v} for v in nodes}
        exact = {0: len(nodes)}
        for t in range(1, 15):
            balls = {
                v: balls[v].union(*(balls[w] for w in adj.get(v, ())))
                for v in nodes
            }
            exact[t] = sum(len(b) for b in balls.values())
            if exact[t] == exact[t - 1]:
                break

        res = neighborhood_function(
            spark, _edges_df(spark, pairs), max_distance=15, lg_k=14
        )
        got = {r["distance"]: r["est_pairs"] for r in res.counts.collect()}
        # lg_k=14 on <=40*40 pairs: HLL is exact-ish; allow 2% slack
        for t, n_exact in exact.items():
            if t in got:
                assert got[t] == pytest.approx(n_exact, rel=0.02), (t, got, exact)
        # converged totals agree
        assert got[max(got)] == pytest.approx(exact[max(exact)], rel=0.02)
        assert res.effective_diameter <= max(exact) + 1

    def test_effective_diameter_path(self, spark):
        # directed path 0->1->2->3: N(t) grows linearly then flattens
        pairs = [(0, 1), (1, 2), (2, 3)]
        res = neighborhood_function(
            spark, _edges_df(spark, pairs), max_distance=10, lg_k=14
        )
        got = {r["distance"]: r["est_pairs"] for r in res.counts.collect()}
        # exact: N(0)=4, N(1)=7, N(2)=9, N(3)=10
        assert got[0] == 4 and got[1] == 7 and got[2] == 9 and got[3] == 10
        assert res.iterations in (3, 4)
        assert 1.0 < res.effective_diameter <= 3.0
