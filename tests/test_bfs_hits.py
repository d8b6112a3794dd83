"""BFS distances + HITS vs pure-Python oracles."""

from __future__ import annotations

import math
from collections import deque

import pytest
from pyspark.sql import functions as F

EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 6),
    (7, 8),  # separate component
    (0, 4), (6, 2), (1, 5),
]


def _bfs_py(edges, sources, directed=False):
    adj: dict = {}
    nodes = set()
    for s, d in edges:
        nodes.update((s, d))
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in sources if s in nodes}
    q = deque(dist)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return {n: dist.get(n) for n in nodes}


def _hits_py(edges, iters):
    nodes = sorted({n for e in edges for n in e})
    links = sorted(set(edges))
    hub = {n: 1.0 / len(nodes) for n in nodes}

    def auth_of(h):
        a = {n: sum(h[u] for u, v in links if v == n) for n in nodes}
        norm = math.sqrt(sum(x * x for x in a.values()))
        return {n: (x / norm if norm > 0 else 0.0) for n, x in a.items()}

    for _ in range(iters):
        auth = auth_of(hub)
        hub = {n: sum(auth[v] for u, v in links if u == n) for n in nodes}
        norm = math.sqrt(sum(h * h for h in hub.values()))
        hub = {n: (h / norm if norm > 0 else 0.0) for n, h in hub.items()}
    # the engine reports authority derived from the FINAL hub (consistent
    # pair; identical at convergence)
    return hub, auth_of(hub)


@pytest.mark.parametrize("directed", [False, True])
def test_bfs_distances_matches_python(spark, directed):
    from plwordnet_spark.graph.bfs import bfs_distances

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    res = bfs_distances(spark, edges, sources=[0, 7], directed=directed)
    got = {r.id: r.dist for r in res.state.collect()}
    want = _bfs_py(EDGES, [0, 7], directed=directed)
    assert got == want
    assert res.converged


def test_bfs_unreachable_is_null(spark):
    from plwordnet_spark.graph.bfs import bfs_distances

    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    res = bfs_distances(spark, edges, sources=[1])
    got = {r.id: r.dist for r in res.state.collect()}
    assert got == {1: 0, 2: 1, 3: None, 4: None}


def test_hits_matches_python(spark):
    from plwordnet_spark.graph.hits import hits

    k = 15
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    res = hits(spark, edges, max_iterations=k, tol=0.0)
    assert res.iterations == k
    hub_py, auth_py = _hits_py(EDGES, k)
    for r in res.state.collect():
        assert r.hub == pytest.approx(hub_py[r.id], abs=1e-9), f"hub {r.id}"
        assert r.authority == pytest.approx(auth_py[r.id], abs=1e-9), f"auth {r.id}"
    # L2 norms are 1
    norms = res.state.agg(
        F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("nh"),
        F.sqrt(F.sum(F.col("authority") * F.col("authority"))).alias("na"),
    ).first()
    assert norms["nh"] == pytest.approx(1.0, abs=1e-12)
    assert norms["na"] == pytest.approx(1.0, abs=1e-12)


def test_hits_converges(spark):
    from plwordnet_spark.graph.hits import hits

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    res = hits(spark, edges, max_iterations=200, tol=1e-10)
    assert res.converged
    assert res.iterations < 200


def _ppr_py(edges, p_map, alpha=0.85, iters=500, tol=1e-12):
    """Personalized PageRank oracle: teleport and dangling mass ∝ p."""
    nodes = sorted({n for e in edges for n in e})
    total = sum(p_map.get(n, 0.0) for n in nodes)
    p = {n: p_map.get(n, 0.0) / total for n in nodes}
    out = {n: 0 for n in nodes}
    for u, _ in edges:
        out[u] += 1
    x = dict(p)
    for _ in range(iters):
        xl = x
        dm = sum(xl[n] for n in nodes if out[n] == 0)
        x = {n: p[n] * ((1 - alpha) + alpha * dm) for n in nodes}
        for u, v in set(edges):
            x[v] += alpha * xl[u] / out[u]
        if sum(abs(x[n] - xl[n]) for n in nodes) < tol:
            break
    return x


def test_personalized_pagerank_matches_python(spark):
    from plwordnet_spark.graph.pagerank import pagerank

    edges_list = list(set(EDGES))
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    seeds = {0: 1.0, 4: 3.0}  # non-uniform teleport over a seed set
    pers = spark.createDataFrame(list(seeds.items()), "id long, p double")
    res = pagerank(
        spark, edges, tol=1e-12, max_iterations=300, weighted=False,
        personalization=pers,
    )
    want = _ppr_py(edges_list, seeds)
    got = {r.id: r.rank for r in res.state.collect()}
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9), f"node {n}"
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # teleport mass concentrates near the seed set
    assert got[4] > max(v for n, v in got.items() if n in (7, 8))


def test_k_core_matches_networkx(spark):
    import networkx as nx

    from plwordnet_spark.graph.kcore import k_core

    g = nx.gnp_random_graph(80, 0.06, seed=7)
    edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
    for k in (2, 3, 4):
        got = {r.id for r in k_core(spark, edges, k=k).state.collect()}
        want = set(nx.k_core(g, k).nodes())
        assert got == want, f"k={k}"


def test_k_core_empty_when_too_sparse(spark):
    from plwordnet_spark.graph.kcore import k_core

    # a path graph has no 2-core
    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], "src long, dst long")
    assert k_core(spark, edges, k=2).state.count() == 0


def test_sssp_matches_python(spark):
    from plwordnet_spark.graph.bfs import sssp_distances

    w_edges = [
        (0, 1, 4.0), (0, 2, 1.0), (2, 1, 2.0), (1, 3, 1.0), (2, 3, 5.0),
        (3, 4, 1.0), (5, 6, 2.0),
    ]
    edges = spark.createDataFrame(w_edges, "src long, dst long, weight double")
    res = sssp_distances(spark, edges, sources=[0], directed=True)
    got = {r.id: r.dist for r in res.state.collect()}
    # hand-checked Dijkstra: 0→2=1, 0→1=min(4, 1+2)=3, 0→3=4, 0→4=5
    assert got == {0: 0.0, 1: 3.0, 2: 1.0, 3: 4.0, 4: 5.0, 5: None, 6: None}
    assert res.converged


class TestBfsTree:
    def test_parents_form_valid_shortest_path_tree(self, spark):
        import random

        import networkx as nx

        from plwordnet_spark.graph.bfs import bfs_tree

        rng = random.Random(3)
        edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src long, dst long")
        res = bfs_tree(spark, df, sources=[0])
        rows = {r["id"]: (r["dist"], r["parent"]) for r in res.state.collect()}
        g = nx.Graph(edges)
        dists = nx.single_source_shortest_path_length(g, 0)
        for i, (d, p) in rows.items():
            if i not in dists:
                assert d is None and p is None
                continue
            assert d == dists[i]
            if d == 0:
                assert p is None
            else:
                # parent is the SMALLEST neighbor one hop closer
                preds = [j for j in g.neighbors(i) if dists.get(j) == d - 1]
                assert p == min(preds)

    def test_path_reconstruction(self, spark):
        from plwordnet_spark.graph.bfs import bfs_tree

        edges = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        rows = {
            r["id"]: r["parent"]
            for r in bfs_tree(spark, df, sources=[0]).state.collect()
        }
        # 3 is at dist 2 via 4 (and via 2 at dist 3? no: 0-4-3 len 2,
        # 0-1-2-3 len 3) -> parent 4; walk back: 3 -> 4 -> 0
        path = [3]
        while rows[path[-1]] is not None:
            path.append(rows[path[-1]])
        assert path == [3, 4, 0]
