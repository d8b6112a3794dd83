"""Seeded label spreading vs pure-Python synchronous replay + watershed
semantics."""

from __future__ import annotations

import random
from collections import defaultdict

from plwordnet_spark.graph.seedprop import seed_label_spread


def _py_spread(edge_list, seeds, rounds, directed=False):
    adj = defaultdict(lambda: defaultdict(float))
    for u, v in edge_list:
        if u == v:
            continue
        adj[v][u] += 1.0  # votes flow src -> dst
        if not directed:
            adj[u][v] += 1.0
    nodes = set(adj)
    for tgt in list(adj.values()):
        nodes |= set(tgt)
    lab = {i: l for i, l in seeds.items() if i in nodes}
    for _ in range(rounds):
        new = dict(lab)
        for i in nodes:
            if i in lab:
                continue  # freeze-on-first-label
            votes = defaultdict(float)
            for j, w in adj[i].items():
                if j in lab:
                    votes[lab[j]] += w
            if votes:
                best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                new[i] = best[0][0]
        lab = new
    return lab


def _spark_spread(spark, edge_list, seeds, rounds, **kw):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    s = spark.createDataFrame(list(seeds.items()), "id long, label long")
    return {
        r["id"]: r["label"]
        for r in seed_label_spread(spark, e, s, rounds=rounds, **kw).collect()
    }


class TestSeedSpread:
    def test_matches_python_replay(self, spark):
        rng = random.Random(19)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
        edges = [(u, v) for u, v in edges if u != v]
        seeds = {0: 100, 7: 200, 13: 300}
        for rounds in (1, 4):
            assert _spark_spread(spark, edges, seeds, rounds) == _py_spread(
                edges, seeds, rounds
            )

    def test_watershed_on_path(self, spark):
        # seeds at both ends of a 7-path: labels meet in the middle;
        # the midpoint ties and takes the smaller label
        edges = [(i, i + 1) for i in range(6)]
        seeds = {0: 5, 6: 9}
        got = _spark_spread(spark, edges, seeds, rounds=6)
        assert got[1] == 5 and got[2] == 5
        assert got[4] == 9 and got[5] == 9
        assert got[3] == 5  # fronts arrive together: tie -> smaller label
        # frozen watershed: extra rounds change nothing (no tie creep)
        assert got == _spark_spread(spark, edges, seeds, rounds=12)

    def test_seeds_clamped_and_unreached_absent(self, spark):
        edges = [(0, 1), (2, 3)]  # two components; seeds only in first
        seeds = {0: 7, 1: 8}
        got = _spark_spread(spark, edges, seeds, rounds=3)
        assert got[0] == 7 and got[1] == 8  # majority would flip; clamped
        assert 2 not in got and 3 not in got

    def test_directed_spreads_forward_only(self, spark):
        edges = [(0, 1), (2, 1)]
        got = _spark_spread(spark, edges, {0: 1}, rounds=3, directed=True)
        assert got == {0: 1, 1: 1}  # 2 gets nothing (no in-path from 0)
