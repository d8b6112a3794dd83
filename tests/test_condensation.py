"""Condensation-DAG topological levels vs networkx longest-path replay."""

from __future__ import annotations

import random

import networkx as nx

from plwordnet_spark.graph.structure import condensation_levels


def _nx_levels(edge_list):
    g = nx.DiGraph()
    g.add_edges_from((u, v) for u, v, in edge_list if u != v)
    cond = nx.condensation(g)  # nodes = scc indices, 'members' attr
    level = {c: 0 for c in cond.nodes}
    for c in nx.topological_sort(cond):
        for succ in cond.successors(c):
            level[succ] = max(level[succ], level[c] + 1)
    out = {}
    for c in cond.nodes:
        members = cond.nodes[c]["members"]
        out[min(members)] = (level[c], len(members))
    return out


def _spark_levels(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = condensation_levels(spark, df)
    return {
        r["component"]: (r["level"], r["n_nodes"]) for r in got.collect()
    }


class TestCondensationLevels:
    def test_matches_networkx_on_random_digraph(self, spark):
        rng = random.Random(31)
        edges = [
            (rng.randrange(40), rng.randrange(40)) for _ in range(120)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        assert _spark_levels(spark, edges) == _nx_levels(edges)

    def test_two_cycles_in_sequence(self, spark):
        # cycle {1,2} -> bridge -> cycle {3,4}: levels 0 and 1
        edges = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)]
        got = _spark_levels(spark, edges)
        assert got == {1: (0, 2), 3: (1, 2)}

    def test_longest_path_wins_over_shortest(self, spark):
        # 0->3 direct but also 0->1->2->3: 3 sits at level 3, not 1
        edges = [(0, 3), (0, 1), (1, 2), (2, 3)]
        got = _spark_levels(spark, edges)
        assert got[3] == (3, 1)
        assert got[0] == (0, 1)

    def test_accepts_precomputed_scc(self, spark):
        from plwordnet_spark.graph.structure import (
            strongly_connected_components,
        )

        edges = [(1, 2), (2, 1), (2, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        scc = strongly_connected_components(spark, df)
        got = condensation_levels(spark, df, scc_result=scc)
        assert {
            r["component"]: r["level"] for r in got.collect()
        } == {1: 0, 3: 1}
