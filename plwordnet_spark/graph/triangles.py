"""Triangle counting via oriented edge self-join (non-iterative).

Classic two-join formulation over the canonically-oriented simple
undirected graph (a < b for every edge): wedges a−b−c with a < b < c from
one self-join, closed by a semi-check join against the edge set. The
a<b<c orientation counts each triangle exactly once AND bounds the
self-join fan-out by the *outgoing* canonical degree — the standard
mitigation for hub skew in triangle listing (high-degree nodes sort last,
so hubs mostly appear as wedge endpoints, not centers).

Golden: equals ``sum(networkx.triangles(G).values()) / 3`` globally and
per-node counts exactly (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_count", "triangles_per_node", "canonical_undirected"]


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Directed multigraph edges → simple undirected canonical (a < b)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter("a != b")
        .distinct()
    )


def _triangle_list(edges: DataFrame) -> DataFrame:
    """(a, b, c) rows, one per triangle, a < b < c."""
    und = canonical_undirected(edges)
    e1 = und.alias("e1")
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2")
    wedges = e1.join(e2, "b").select("a", "b", "c")  # a < b < c by construction
    closing = und.select(F.col("a"), F.col("b").alias("c"))
    return wedges.join(closing, ["a", "c"], "left_semi")


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count of the underlying simple undirected graph."""
    return _triangle_list(edges).count()


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(id, triangles) — each triangle credits its three vertices."""
    tri = _triangle_list(edges)
    exploded = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    return exploded.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
