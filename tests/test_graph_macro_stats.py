"""Conductance / rich-club / average-neighbor-degree: networkx parity
on random graphs plus closed-form goldens on crafted graphs."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from plwordnet_spark.graph.stats import (
    avg_neighbor_degree,
    conductance,
    rich_club,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _random_graph(seed, n=40, p=0.12):
    rng = np.random.RandomState(seed)
    g = nx.gnp_random_graph(n, p, seed=int(rng.randint(1 << 30)))
    # drop isolated nodes: the engine works over an edge list, so a
    # vertex exists iff it touches >=1 edge
    g.remove_nodes_from(list(nx.isolates(g)))
    return g


def test_conductance_matches_networkx_on_random_partition(spark):
    g = _random_graph(3)
    rng = np.random.RandomState(5)
    labels = {v: int(rng.randint(0, 3)) for v in g.nodes}
    edges = _edges_df(spark, [(int(u), int(v)) for u, v in g.edges])
    comm = spark.createDataFrame(
        [(int(v), c) for v, c in labels.items()], "id long, community int"
    )
    got = {r["community"]: r for r in conductance(edges, comm).collect()}
    for c in set(labels.values()):
        members = {v for v, l in labels.items() if l == c}
        want = nx.conductance(g, members) if members and len(members) < len(g) else 0.0
        assert got[c]["conductance"] == pytest.approx(want, abs=1e-8), c
        vol = sum(d for _, d in g.degree(members))
        assert got[c]["volume"] == vol
        assert got[c]["cut_edges"] == nx.cut_size(g, members)


def test_conductance_unlabeled_vertices_are_outside_every_community(spark):
    # path 0-1-2-3; only {0,1} labeled: cut = edge (1,2), vol = deg0+deg1 = 3
    edges = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    comm = spark.createDataFrame([(0, 0), (1, 0)], "id long, community int")
    row = conductance(edges, comm).collect()[0]
    assert (row["cut_edges"], row["volume"]) == (1, 3)
    assert row["conductance"] == pytest.approx(1 / 3)


def test_conductance_whole_graph_community_is_zero(spark):
    edges = _edges_df(spark, [(0, 1), (1, 2)])
    comm = spark.createDataFrame([(i, 9) for i in range(3)], "id long, community int")
    row = conductance(edges, comm).collect()[0]
    assert row["cut_edges"] == 0 and row["conductance"] == 0.0


def test_rich_club_matches_networkx(spark):
    g = _random_graph(11, n=50, p=0.15)
    edges = _edges_df(spark, [(int(u), int(v)) for u, v in g.edges])
    want = nx.rich_club_coefficient(g, normalized=False)
    ks = sorted(want)
    got = {r["k"]: r["phi"] for r in rich_club(edges, ks).collect()}
    for k in ks:
        assert got[k] == pytest.approx(want[k], abs=1e-8), k


def test_rich_club_degenerate_thresholds(spark):
    # star: center degree 4, leaves degree 1 -> k=1 club = {center} alone
    edges = _edges_df(spark, [(0, i) for i in range(1, 5)])
    got = {r["k"]: r for r in rich_club(edges, [0, 1, 10]).collect()}
    assert got[0]["phi"] == pytest.approx(2 * 4 / (5 * 4))
    assert (got[1]["n_nodes"], got[1]["phi"]) == (1, 0.0)
    assert (got[10]["n_nodes"], got[10]["n_edges"], got[10]["phi"]) == (0, 0, 0.0)


def test_avg_neighbor_degree_matches_networkx(spark):
    g = _random_graph(23, n=45, p=0.1)
    edges = _edges_df(spark, [(int(u), int(v)) for u, v in g.edges])
    want = nx.average_degree_connectivity(g)
    got = {r["degree"]: r for r in avg_neighbor_degree(edges).collect()}
    assert set(got) == {k for k in want if k > 0}
    for k, v in want.items():
        if k == 0:
            continue
        assert got[k]["avg_knn"] == pytest.approx(v, abs=1e-8), k
        assert got[k]["n_nodes"] == sum(1 for _, d in g.degree if d == k)


def test_avg_neighbor_degree_star_is_disassortative(spark):
    edges = _edges_df(spark, [(0, i) for i in range(1, 6)])
    got = {r["degree"]: r["avg_knn"] for r in avg_neighbor_degree(edges).collect()}
    assert got == {1: 5.0, 5: 1.0}


class TestDirectedTriangleCensus:
    @staticmethod
    def _py_census(edges):
        es = {(u, v) for u, v in edges if u != v}
        two = trans = cyc3 = 0
        for (u, v) in es:
            for (v2, w) in es:
                if v2 == v and w != u:
                    two += 1
                    if (u, w) in es:
                        trans += 1
                    if (w, u) in es:
                        cyc3 += 1
        return two, trans, cyc3 // 3

    def _run(self, spark, edges, **kw):
        from plwordnet_spark.graph.triangles import directed_triangle_census

        df = spark.createDataFrame(edges, "src long, dst long")
        r = directed_triangle_census(df, **kw).first()
        return (r["n_two_paths"], r["n_transitive"], r["n_cyclic"])

    def test_matches_pure_python_on_random_digraph(self, spark):
        import random

        rng = random.Random(23)
        edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
        assert self._run(spark, edges) == self._py_census(edges)

    def test_feed_forward_vs_cycle(self, spark):
        # pure feed-forward: u->v, v->w, u->w
        assert self._run(spark, [(1, 2), (2, 3), (1, 3)]) == (1, 1, 0)
        # pure 3-cycle: 3 wedges, each closed cyclically, ONE triangle
        assert self._run(spark, [(1, 2), (2, 3), (3, 1)]) == (3, 0, 1)

    def test_mid_degree_cap_prunes_hub_wedges(self, spark):
        # star hub 0 with 5 in + 5 out: 25 wedges through the hub,
        # capped out entirely at max_mid_degree=4
        edges = [(i, 0) for i in range(1, 6)] + [(0, i) for i in range(6, 11)]
        assert self._run(spark, edges)[0] == 25
        assert self._run(spark, edges, max_mid_degree=4)[0] == 0


class TestAttackRobustness:
    def test_matches_networkx_replay(self, spark):
        import math
        import random

        import networkx as nx

        from plwordnet_spark.graph.stats import attack_robustness

        rng = random.Random(4)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(55)]
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src long, dst long")
        fracs = (0.0, 0.1, 0.3)
        got = {
            r["frac"]: (r["n_removed"], r["n_nodes_left"], r["largest_cc"])
            for r in attack_robustness(spark, df, fracs=fracs).collect()
        }
        g = nx.Graph(edges)
        order = sorted(g.nodes, key=lambda i: (-g.degree[i], i))
        n = g.number_of_nodes()
        for f in fracs:
            k = math.ceil(f * n)
            h = g.copy()
            h.remove_nodes_from(order[:k])
            largest = max(
                (len(c) for c in nx.connected_components(h)), default=0
            )
            assert got[f] == (k, n - k, largest)

    def test_star_shatters_under_hub_removal(self, spark):
        from plwordnet_spark.graph.stats import attack_robustness

        edges = [(0, i) for i in range(1, 21)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["frac"]: r["largest_cc"]
            for r in attack_robustness(spark, df, fracs=(0.0, 0.05)).collect()
        }
        assert got[0.0] == 21  # intact star
        assert got[0.05] == 1  # hub (top ~1 of 21) gone -> isolated leaves


class TestRandomFailureMode:
    def test_star_survives_random_failure_but_not_attack(self, spark):
        from plwordnet_spark.graph.stats import attack_robustness

        # big star: hub attack shatters instantly, random failure at the
        # same fraction almost surely hits a leaf and keeps the core
        edges = [(0, i) for i in range(1, 41)]
        df = spark.createDataFrame(edges, "src long, dst long")
        atk = {r["frac"]: r["largest_cc"]
               for r in attack_robustness(df.sparkSession, df,
                                          fracs=(0.03,)).collect()}
        rnd = {r["frac"]: r["largest_cc"]
               for r in attack_robustness(df.sparkSession, df, fracs=(0.03,),
                                          mode="random").collect()}
        assert atk[0.03] == 1      # hub removed -> isolated leaves
        assert rnd[0.03] >= 38     # a leaf removed -> star survives

    def test_random_mode_matches_formula_replay(self, spark):
        from plwordnet_spark.graph.stats import attack_robustness
        from plwordnet_spark.textops.sampling import SAMPLE_A, SAMPLE_B, SAMPLE_P

        import math

        edges = [(i, (i + 1) % 20) for i in range(20)]
        df = spark.createDataFrame(edges, "src long, dst long")
        f = 0.25
        got = attack_robustness(spark, df, fracs=(f,), mode="random").first()
        nodes = sorted({x for e in edges for x in e})
        k = math.ceil(f * len(nodes))
        draw = {i: (((i + 1) % SAMPLE_P) * SAMPLE_A + SAMPLE_B) % SAMPLE_P for i in nodes}
        removed = set(sorted(nodes, key=lambda i: (draw[i], i))[:k])
        # replay CC on the ring minus removed
        kept = [e for e in edges if e[0] not in removed and e[1] not in removed]
        import networkx as nx

        g = nx.Graph(kept)
        g.add_nodes_from(set(nodes) - removed)
        largest = max((len(c) for c in nx.connected_components(g)), default=0)
        assert (got["n_removed"], got["largest_cc"]) == (k, largest)
