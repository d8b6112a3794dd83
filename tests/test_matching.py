"""Maximal matching: exact replay parity vs a pure-python
implementation of the same deterministic rounds + validity checks."""

from __future__ import annotations

import numpy as np

from plwordnet_spark.graph.matching import (
    MATCH_A,
    MATCH_B,
    MATCH_B2,
    MATCH_P,
    maximal_matching,
)


def _random_edges(spark, seed=31, n=50, m=160):
    rng = np.random.RandomState(seed)
    pairs = {
        (int(a), int(b)) for a, b in rng.randint(0, n, size=(m, 2)) if a != b
    }
    return spark.createDataFrame(sorted(pairs), "src long, dst long"), pairs


def _python_matching(pairs, seed=17):
    active = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    out = {}
    r = 1
    while active:
        p = {
            e: ((e[0] % MATCH_P) * MATCH_A + (e[1] % MATCH_P) * MATCH_B2
                + r * MATCH_B + seed) % MATCH_P
            for e in active
        }
        best: dict[int, tuple] = {}
        for (u, v), pe in p.items():
            k = (pe, u, v)
            for w in (u, v):
                if w not in best or k < best[w]:
                    best[w] = k
        win = {
            (u, v)
            for (u, v), pe in p.items()
            if best[u] == (pe, u, v) and best[v] == (pe, u, v)
        }
        for e in win:
            out[e] = r
        gone = {w for e in win for w in e}
        active = {e for e in active if e[0] not in gone and e[1] not in gone}
        r += 1
    return out


def test_matching_matches_pure_python_replay(spark):
    edges, pairs = _random_edges(spark)
    got = {
        (r["u"], r["v"]): r["match_round"]
        for r in maximal_matching(spark, edges).collect()
    }
    assert got == _python_matching(pairs)
    assert got  # non-degenerate


def test_matching_is_vertex_disjoint_and_maximal(spark):
    edges, pairs = _random_edges(spark, seed=37, n=40, m=120)
    matched = [
        (r["u"], r["v"]) for r in maximal_matching(spark, edges).collect()
    ]
    used = [w for e in matched for w in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    # maximality: every unmatched edge touches a matched vertex
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    for e in und - set(matched):
        assert e[0] in set(used) or e[1] in set(used)


def test_matching_handles_self_loops_and_empty(spark):
    edges = spark.createDataFrame([(1, 1)], "src long, dst long")
    assert maximal_matching(spark, edges).count() == 0
    pair = spark.createDataFrame([(3, 2)], "src long, dst long")
    rows = maximal_matching(spark, pair).collect()
    assert [(r["u"], r["v"], r["match_round"]) for r in rows] == [(2, 3, 1)]
