"""Temporal (time-respecting) earliest-arrival reachability vs a pure-
Python fixpoint replay."""

from __future__ import annotations

import random

from plwordnet_spark.graph.temporal import temporal_reachability


def _py_earliest_arrival(edges, sources, start, strict=False):
    arr = {s: start for s in sources}
    changed = True
    while changed:
        changed = False
        for u, v, t in edges:
            if u == v or u not in arr:
                continue
            ok = t > arr[u] if strict else t >= arr[u]
            if ok and (v not in arr or t < arr[v]):
                arr[v] = t
                changed = True
    return arr


def _spark_arr(spark, edges, sources, start, strict=False):
    df = spark.createDataFrame(edges, "src long, dst long, t long")
    res = temporal_reachability(
        spark, df, sources, start_time=start, strict=strict
    )
    assert res.converged
    return {r["id"]: r["arrival"] for r in res.state.collect()}


class TestTemporalReachability:
    def test_matches_python_on_random_contacts(self, spark):
        rng = random.Random(7)
        edges = [
            (rng.randrange(30), rng.randrange(30), rng.randrange(50))
            for _ in range(150)
        ]
        sources = [0, 1]
        expected = _py_earliest_arrival(edges, sources, start=10)
        # drop phantom sources not present in the edge set
        nodes = {x for u, v, _t in edges if u != v for x in (u, v)}
        expected = {k: v for k, v in expected.items() if k in nodes}
        assert _spark_arr(spark, edges, sources, start=10) == expected

    def test_strict_forbids_same_instant_chain(self, spark):
        # 1 -(t5)-> 2 -(t5)-> 3: non-strict chains through at t=5,
        # strict needs a later edge and never reaches 3
        edges = [(1, 2, 5), (2, 3, 5)]
        non_strict = _spark_arr(spark, edges, [1], start=0)
        assert non_strict == {1: 0, 2: 5, 3: 5}
        strict = _spark_arr(spark, edges, [1], start=0, strict=True)
        assert strict == {1: 0, 2: 5}

    def test_early_edge_unusable(self, spark):
        # the 0->1 contact happened before the start time: unreachable
        edges = [(0, 1, 3), (0, 2, 9)]
        got = _spark_arr(spark, edges, [0], start=5)
        assert got == {0: 5, 2: 9}

    def test_detour_beats_direct_when_earlier(self, spark):
        # direct 0->3 at t=20; detour 0->1->3 arrives at t=12
        edges = [(0, 3, 20), (0, 1, 10), (1, 3, 12)]
        got = _spark_arr(spark, edges, [0], start=0)
        assert got[3] == 12

    def test_absent_source_emits_nothing(self, spark):
        edges = [(1, 2, 5)]
        got = _spark_arr(spark, edges, [99], start=0)
        assert got == {}
