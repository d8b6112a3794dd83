"""Triangle counting via degree-oriented edge self-join (non-iterative).

Classic two-join formulation, with the standard skew guard for
power-law graphs: every undirected edge is oriented from its
lower-(degree, id) endpoint to its higher one (a total order). Each
triangle then has exactly one vertex with two out-edges (its minimum in
the order), so one self-join on that center + one closing semi-join
counts every triangle exactly once. Degree orientation bounds a wedge
center's out-degree by O(√m) — orienting by id alone would make a
low-id hub a wedge center with O(hub_degree²) fan-out, which is exactly
the web-graph case (SURVEY.md §1.4 hub skew).

Golden: equals ``sum(networkx.triangles(G).values()) / 3`` globally and
per-node counts exactly (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "triangle_count",
    "triangles_per_node",
    "clustering_coefficient",
    "canonical_undirected",
    "directed_triangle_census",
]


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Directed multigraph edges → simple undirected canonical (a < b)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter("a != b")
        .distinct()
    )


def _oriented_by_degree(und: DataFrame) -> DataFrame:
    """(u, v, kv) edges pointing low→high in the (degree, id) total
    order; kv is v's sort key, carried for the wedge-ordering filter."""
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ka = deg.select(F.col("id").alias("a"), F.struct("deg", F.col("id").alias("n")).alias("ka"))
    kb = deg.select(F.col("id").alias("b"), F.struct("deg", F.col("id").alias("n")).alias("kb"))
    keyed = und.join(ka, "a").join(kb, "b")
    return keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kv"),
    )


def _triangle_list(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """((x, y, z) triangle rows, the cached oriented table). x = the
    (deg, id)-minimum vertex; y, z its out-neighbors in order. The
    caller owns the cached table's lifecycle (it is referenced three
    times in the plan) and must unpersist it after its final action."""
    o = _oriented_by_degree(canonical_undirected(edges)).cache()
    e1 = o.select("u", F.col("v").alias("y"), F.col("kv").alias("ky"))
    e2 = o.select("u", F.col("v").alias("z"), F.col("kv").alias("kz"))
    wedges = (
        e1.join(e2, "u")
        .filter(F.col("ky") < F.col("kz"))
        .select(F.col("u").alias("x"), "y", "z")
    )
    closing = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    return wedges.join(closing, ["y", "z"], "left_semi"), o


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count of the underlying simple undirected graph."""
    tri, o = _triangle_list(edges)
    n = tri.count()
    o.unpersist()
    return n


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(id, triangles) — each triangle credits its three vertices."""
    tri, o = _triangle_list(edges)
    # pin the triangle list before releasing the oriented cache it
    # derives from (the returned frame stays lazily consumable)
    tri = tri.localCheckpoint(eager=True)
    o.unpersist()
    exploded = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
    )
    return exploded.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, coeff) — local clustering coefficient
    over the simple undirected graph: coeff = 2·T(v) / (deg·(deg−1)),
    0.0 for degree-1 vertices. The web-graph reading: how tightly a
    page's link neighborhood closes on itself (1.0 = clique, 0.0 =
    star), the per-node refinement of the global triangle count the
    reference's cohesion checks use (reference graph stats:
    plwordnet_handler/base/structure/graph.py).

    Scale shape: one triangle listing (degree-oriented, O(m^1.5) work
    bounded per wedge center by O(√m)) + one degree aggregate + one
    left join — no new shuffles beyond ``triangles_per_node``. Both
    numerator and denominator are exact integers, so the single IEEE
    division is bit-identical across engines (DuckDB-oracle-safe
    without rounding).
    """
    und = canonical_undirected(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangles_per_node(edges)
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(F.col("degree") < 2, F.lit(0.0))
            .otherwise(
                (F.coalesce("triangles", F.lit(0)) * F.lit(2.0))
                / (F.col("degree") * (F.col("degree") - F.lit(1)))
            )
            .alias("coeff"),
        )
    )


def directed_triangle_census(
    edges: DataFrame, max_mid_degree: int | None = None
) -> DataFrame:
    """Directed 2-path and triangle-motif census; one row
    ``(n_two_paths, n_transitive, n_cyclic)``.

    On the simple digraph (self-loops dropped, parallel edges deduped):

    * ``n_two_paths`` — ordered paths u→v→w with u ≠ w (the wedge
      census, denominator of directed closure ratios),
    * ``n_transitive`` — 2-paths closed by the shortcut u→w: the
      feed-forward motif, a hierarchy signal (tutorial→section→page
      plus tutorial→page),
    * ``n_cyclic`` — cyclic triangles {u→v→w→u}, each counted ONCE
      (a cycle closes all 3 of its rotations, so the closure count is
      divided by 3). Link exchanges / reciprocal rings show up here.

    Web-graph reading: transitive ≫ cyclic is the hallmark of a
    hierarchical link structure; a cyclic surplus flags collusive
    linking (the same signal family as hostgraph's nepotistic ratio).

    Shape: one self-join on the mid vertex + two semi-join closures —
    non-iterative, all hash joins. The Σ deg_in(v)·deg_out(v) wedge
    landmine is the same one linkpred names: a hub mid-vertex fans out
    quadratically. ``max_mid_degree`` prunes wedge centers whose
    in-degree or out-degree exceeds the cap BEFORE the self-join (the
    standard approximate-census guard; None = exact).
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    mid_in = e.groupBy(F.col("dst").alias("v")).agg(
        F.count(F.lit(1)).alias("din")
    )
    mid_out = e.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("dout")
    )
    first = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    second = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    if max_mid_degree is not None:
        ok_mid = (
            mid_in.join(mid_out, "v")
            .filter(
                (F.col("din") <= max_mid_degree)
                & (F.col("dout") <= max_mid_degree)
            )
            .select("v")
        )
        first = first.join(ok_mid, "v", "left_semi")
        second = second.join(ok_mid, "v", "left_semi")
    paths = first.join(second, "v").filter(F.col("u") != F.col("w")).cache()
    n_two = paths.count()
    n_trans = paths.join(
        e.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_semi",
    ).count()
    n_cyc_closures = paths.join(
        e.select(F.col("src").alias("w"), F.col("dst").alias("u")),
        ["w", "u"],
        "left_semi",
    ).count()
    paths.unpersist()
    e.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_two, n_trans, n_cyc_closures // 3)],
        "n_two_paths long, n_transitive long, n_cyclic long",
    )
