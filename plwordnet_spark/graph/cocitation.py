"""Co-citation and bibliographic coupling: directed two-path similarity.

The DIRECTED counterparts of the undirected link-prediction family
(graph/linkpred.py) — the two classic citation-analysis measures
(Small 1973 / Kessler 1963) that underpin "related pages" on link
graphs where direction matters:

* **co-citation**: pages (a, b) are similar when many pages LINK TO
  BOTH — strength = |in(a) ∩ in(b)|. Two-path join through the shared
  SOURCE: edges(s→a) ⋈ edges(s→b), a < b.
* **bibliographic coupling**: pages (a, b) are similar when they LINK
  TO the same targets — strength = |out(a) ∩ out(b)|. Two-path join
  through the shared TARGET.

Scale design mirrors linkpred's documented landmine handling: the join
is quadratic in the PIVOT node's fan-out (a src with out-degree d
creates d² co-citation pairs; a dst with in-degree d creates d²
coupling pairs), so both operators take a ``max_fanout`` cap excluding
pivot nodes above it from the join — a portal page linking 50k targets
says ~nothing about any pair's affinity while costing 2.5e9 rows. The
groupBy(a, b) count folds map-side; ``top_k`` prunes per-node inside
the shuffle via the same window discipline as linkpred.

Deterministic and SQL-expressible (driver oracle replays the two-path
join in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plwordnet_spark.cache import CacheScope

__all__ = ["cocitation", "bibliographic_coupling"]


def _two_path_pairs(
    edges: DataFrame,
    pivot_col: str,
    leaf_col: str,
    max_fanout: int | None,
    scope: CacheScope | None,
) -> DataFrame:
    """Distinct (pivot, leaf) edges → (a, b, strength): a < b leaf pairs
    sharing a pivot, counted per pair. Pivots with fan-out above
    ``max_fanout`` are excluded BEFORE the self-join."""
    pl = edges.select(
        F.col(pivot_col).alias("p"), F.col(leaf_col).alias("leaf")
    ).distinct()
    if max_fanout is not None:
        fan = pl.groupBy("p").agg(F.count(F.lit(1)).alias("fan"))
        pl = pl.join(fan.filter(F.col("fan") <= max_fanout).select("p"), "p")
    # the self-join reads pl twice — cache it (scope owns release)
    pl = scope.cache(pl) if scope is not None else pl.cache()
    x, y = pl.alias("x"), pl.alias("y")
    return (
        x.join(y, (F.col("x.p") == F.col("y.p")) & (F.col("x.leaf") < F.col("y.leaf")))
        .groupBy(F.col("x.leaf").alias("a"), F.col("y.leaf").alias("b"))
        .agg(F.count(F.lit(1)).alias("strength"))
    )


def _topk_per_node(pairs: DataFrame, top_k: int | None) -> DataFrame:
    if top_k is None:
        return pairs
    both = pairs.unionByName(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "strength"
        )
    )
    win = Window.partitionBy("a").orderBy(F.desc("strength"), F.asc("b"))
    return (
        both.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= top_k)
        .select(F.col("a").alias("node"), F.col("b").alias("candidate"), "strength", "rank")
    )


def cocitation(
    edges: DataFrame,
    max_fanout: int | None = 10_000,
    top_k: int | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """edges(src, dst) → (a, b, strength): dst pairs (a < b) by number
    of distinct common citing sources. With ``top_k``, the symmetric
    recommender view (node, candidate, strength, rank) instead.

    ``max_fanout`` bounds the deg² blowup at hub SOURCES (directory
    pages); the cap is the linkpred recall/cost contract — see
    BENCH/LINKPRED.md for the measured curve shape. Internal caches
    follow the :class:`CacheScope` ownership contract (cache.py)."""
    return _topk_per_node(
        _two_path_pairs(edges, "src", "dst", max_fanout, scope), top_k
    )


def bibliographic_coupling(
    edges: DataFrame,
    max_fanout: int | None = 10_000,
    top_k: int | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """edges(src, dst) → (a, b, strength): src pairs (a < b) by number
    of distinct common link targets; ``max_fanout`` bounds hub TARGETS
    (everyone links the homepage). Same contracts as :func:`cocitation`."""
    return _topk_per_node(
        _two_path_pairs(edges, "dst", "src", max_fanout, scope), top_k
    )
