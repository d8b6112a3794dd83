"""k-truss decomposition: cohesive-subgraph mining by support peeling.

The k-truss is the maximal subgraph in which every edge closes at least
k-2 triangles — the standard noise-robust community core for web link
graphs (denser than k-core, cheaper than clique mining). The reference
validates its relation graph through cohesion checks
(plwordnet_handler's graph build asserts relation-set closure); k-truss
is that idea generalized to a mineable operator.

Algorithm: repeat { count per-edge triangle support on the surviving
edge set; drop edges with support < k-2 } until no edge is dropped.
Peeling is monotone (support only decreases as edges leave), so the
fixpoint is the k-truss regardless of round grouping — and extra rounds
after the fixpoint are no-ops, which is what lets a fixed-unroll SQL
oracle replay a to-convergence run exactly.

Scale shape: each round reuses the degree-oriented wedge join from
graph/triangles.py (wedge centers bounded O(sqrt(m)) on power-law
graphs — the hub-skew guard), then one explode→groupBy support count
with map-side partial agg, then a join-filter back onto the edge set.
Surviving-edge frames are localCheckpoint'ed per round (lineage cut);
the only driver-side value per round is the surviving-edge count that
decides convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.graph.triangles import _triangle_list, canonical_undirected

__all__ = ["ktruss", "edge_support"]


def edge_support(und: DataFrame) -> DataFrame:
    """(a, b, support) for canonical undirected edges (a < b); edges in
    no triangle are absent (support 0)."""
    tri, o = _triangle_list(und.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    tri = tri.localCheckpoint(eager=True)
    o.unpersist()
    # each triangle credits its three edges, re-canonicalized to id
    # order (the triangle list is (deg, id)-oriented, not id-ordered)
    sides = (
        tri.select(F.col("x").alias("p"), F.col("y").alias("q"))
        .unionAll(tri.select(F.col("x").alias("p"), F.col("z").alias("q")))
        .unionAll(tri.select(F.col("y").alias("p"), F.col("z").alias("q")))
    )
    return (
        sides.select(F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def ktruss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
) -> DataFrame:
    """edges(src, dst, …) → canonical (a, b) edges of the k-truss of the
    underlying simple undirected graph. k >= 3; k=3 keeps every edge in
    at least one triangle. Empty result when the graph has no k-truss.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 (got {k}); the 2-truss is every edge")
    cur = canonical_undirected(edges).localCheckpoint(eager=True)
    n_cur = cur.count()
    for _ in range(max_rounds):
        if n_cur == 0:
            break
        sup = edge_support(cur)
        nxt = (
            cur.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        cur = nxt
        if n_nxt == n_cur:
            break
        n_cur = n_nxt
    return cur
