"""node2vec biased walks: pure-python second-order replay parity and the
p/q steering semantics."""

from __future__ import annotations

import random

from plwordnet_spark.graph.walks import node2vec_walks


def _py_u(start, walk, step, seed):
    P, R1, R2, R3, R4, C = 1_000_003, 743_177, 499_979, 104_729, 15_485_863, 12_345
    h = (
        (start % P) * R1
        + (walk * R4) % P
        + (step * R2) % P
        + (seed * R3 + C) % P
    ) % P
    h = (h * R2 + C) % P
    return h / P


def _py_node2vec(edge_list, walk_length, p, q, walks_per_node, seed):
    w = {}
    for u, v in edge_list:
        if u != v:
            w[(u, v)] = w.get((u, v), 0.0) + 1.0
    adj = {}
    for (u, v), wt in w.items():
        adj.setdefault(u, []).append((v, wt))
    for u in adj:
        adj[u].sort()
    out = []
    for start in sorted(adj):
        for wk in range(walks_per_node):
            prev, node = None, start
            out.append((start, wk, 0, node))
            for step in range(1, walk_length + 1):
                if node not in adj:
                    break
                if prev is None:
                    cand = adj[node]
                else:
                    cand = []
                    for v, wt in adj[node]:
                        if v == prev:
                            b = wt / p
                        elif (prev, v) in w:
                            b = wt
                        else:
                            b = wt / q
                        cand.append((v, b))
                tot = sum(b for _, b in cand)
                u = _py_u(start, wk, step, seed)
                cum = 0.0
                nxt = None
                for v, b in cand:
                    lo = cum / tot
                    cum += b
                    hi = cum / tot
                    if lo <= u < hi:
                        nxt = v
                        break
                if nxt is None:
                    break
                prev, node = node, nxt
                out.append((start, wk, step, node))
    return sorted(out)


class TestNode2vec:
    def test_matches_python_replay(self, spark):
        rng = random.Random(41)
        edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(70)]
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = sorted(
            (r["start"], r["walk"], r["step"], r["node"])
            for r in node2vec_walks(
                spark, df, walk_length=5, p=2.0, q=4.0,
                walks_per_node=2, seed=7,
            ).collect()
        )
        assert got == _py_node2vec(edges, 5, 2.0, 4.0, 2, 7)

    def test_p_q_one_equals_first_order(self, spark):
        from plwordnet_spark.graph.walks import random_walks

        rng = random.Random(42)
        edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(50)]
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src long, dst long")
        n2v = sorted(
            tuple(r) for r in node2vec_walks(
                spark, df, walk_length=4, p=1.0, q=1.0, seed=9
            ).collect()
        )
        first = sorted(
            tuple(r) for r in random_walks(
                spark, df, walk_length=4, seed=9
            ).collect()
        )
        assert n2v == first

    def test_high_p_blocks_immediate_return(self, spark):
        # triangle 0-1-2 (both directions): with p astronomically large
        # the walker never revisits the node it just left
        edges = []
        for a, b in ((0, 1), (1, 2), (2, 0)):
            edges += [(a, b), (b, a)]
        df = spark.createDataFrame(edges, "src long, dst long")
        walks = node2vec_walks(
            spark, df, walk_length=8, p=1e12, q=1.0, seed=3
        ).collect()
        seq = {}
        for r in walks:
            seq.setdefault((r["start"], r["walk"]), []).append(
                (r["step"], r["node"])
            )
        for path in seq.values():
            nodes = [n for _, n in sorted(path)]
            for i in range(2, len(nodes)):
                assert nodes[i] != nodes[i - 2]
