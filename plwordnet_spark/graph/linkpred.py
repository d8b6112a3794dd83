"""Link prediction over the undirected neighbor graph: common-neighbor
counts and Adamic-Adar scores.

The standard "related pages / missing link" signal for web graphs:
candidate pair (a, b) scores Σ_{z ∈ N(a)∩N(b)} 1/ln(deg(z)) — shared
neighbors weighted inversely by how promiscuous they are. Classic
PySpark shape: one two-path self-join on the shared neighbor z
(und(z,a) ⋈ und(z,b), a < b) followed by a groupBy(a, b) sum — both
with map-side partial aggregation.

Scale design (the two-path join is quadratic in hub degree — THE
landmine here):

* a degree-z cap (``max_degree``) excludes mega-hubs from the join: a
  node linked by everyone generates deg² candidate pairs while
  contributing at most 1/ln(deg) ≈ 0 per pair. Capping is the
  documented standard practice, bounds the join at
  O(Σ_{deg(z)≤cap} deg(z)²), and is exposed (not hidden) so callers
  choose the recall/cost point;
* neighbor sets come from the same canonical undirected edge view as
  the triangle counter (``triangles.canonical_undirected``), so the
  two operators can never diverge on edge semantics;
* ``top_k`` keeps only the k best candidates per NODE via a window —
  the output a recommender actually consumes — pruning the result
  before it leaves the shuffle.

Beyond the reference (its graphs go to networkx; SURVEY §2.10 G6
family). Deterministic and SQL-expressible: the driver oracle replays
the same two-path join + 1/ln(deg) sum in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plwordnet_spark.cache import CacheScope
from plwordnet_spark.graph.triangles import canonical_undirected

__all__ = [
    "adamic_adar",
    "common_neighbors",
    "jaccard_coefficient",
    "resource_allocation",
]


def _cached(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    return scope.cache(df) if scope is not None else df.cache()


def _neighbors_with_degree(edges: DataFrame, max_degree: int | None) -> DataFrame:
    """(z, nbr, deg_z): both directions of the canonical undirected edge
    set, annotated with z's degree, mega-hubs above ``max_degree``
    excluded from the shared-neighbor role."""
    und = canonical_undirected(edges)  # (a, b) with a < b, deduped
    nbrs = und.select(F.col("a").alias("z"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("z"), F.col("a").alias("nbr"))
    )
    deg = nbrs.groupBy("z").agg(F.count(F.lit(1)).alias("deg_z"))
    out = nbrs.join(deg, "z")
    if max_degree is not None:
        out = out.filter(F.col("deg_z") <= F.lit(max_degree))
    return out


def common_neighbors(
    edges: DataFrame,
    max_degree: int | None = 10_000,
    min_common: int = 1,
    scope: CacheScope | None = None,
) -> DataFrame:
    """(a, b, common) for unordered pairs sharing ≥ ``min_common``
    neighbors of degree ≤ ``max_degree``. Includes already-linked pairs
    (filter with an anti-join against the edge set for pure link
    prediction — kept separate so the score is reusable for dedup/
    similarity too). The two-path input ``nz`` is cached (referenced
    twice by the self-join); pass a :class:`CacheScope` to own its
    release after consuming the result — without one it stays cached
    for the returned plan's lifetime."""
    nz = _cached(_neighbors_with_degree(edges, max_degree), scope)
    left = nz.select("z", F.col("nbr").alias("a"))
    right = nz.select("z", F.col("nbr").alias("b"))
    return (
        left.join(right, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= F.lit(min_common))
    )


def adamic_adar(
    edges: DataFrame,
    max_degree: int | None = 10_000,
    top_k: int | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Adamic-Adar link-prediction scores.

    score(a,b) = Σ_{z ∈ N(a)∩N(b), deg(z) ≤ max_degree} 1 / ln(deg_z).
    Shared neighbors of degree 1 cannot exist (z links both a and b ⇒
    deg_z ≥ 2), so ln(deg_z) is never 0.

    Without ``top_k``: (a, b, score) per canonical unordered pair
    (a < b). With ``top_k``: the recommender view — (node, candidate,
    score), the k highest-scoring candidates FOR EACH NODE (each
    unordered pair can appear under both of its endpoints; ranking per
    canonical min-endpoint would silently prune a node's best links
    whenever it is the larger id). Ties broken by candidate id for
    determinism.

    The shared two-path input (``nz``) is referenced twice by the
    self-join; it is cache()d here and materialized by the first action
    on the result. Pass a :class:`CacheScope` to own its release after
    consuming the result; without one it stays cached for the returned
    plan's lifetime."""
    nz = _cached(_neighbors_with_degree(edges, max_degree), scope)
    left = nz.select("z", F.col("nbr").alias("a"), "deg_z")
    right = nz.select("z", F.col("nbr").alias("b"))
    scored = (
        left.join(right, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.lit(1.0) / F.log(F.col("deg_z"))).alias("score"))
    )
    if top_k is not None:
        per_node = scored.select(
            F.col("a").alias("node"), F.col("b").alias("candidate"), "score"
        ).unionByName(
            scored.select(
                F.col("b").alias("node"), F.col("a").alias("candidate"), "score"
            )
        )
        w = Window.partitionBy("node").orderBy(F.desc("score"), F.asc("candidate"))
        return (
            per_node.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= top_k)
            .drop("_rk")
        )
    return scored


def resource_allocation(
    edges: DataFrame,
    max_degree: int | None = 10_000,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Resource-Allocation link-prediction index (Zhou/Lü/Zhang 2009):
    score(a,b) = Σ_{z ∈ N(a)∩N(b), deg(z) ≤ max_degree} 1 / deg_z.

    The Adamic-Adar twin with a harsher hub penalty (1/deg instead of
    1/ln deg) — the strongest of the classic local indices on scale-free
    graphs in published evaluations. Same two-path join + map-side-
    partial-agg shape, same ``max_degree`` landmine bound, same
    :class:`CacheScope` ownership contract as :func:`adamic_adar`."""
    nz = _cached(_neighbors_with_degree(edges, max_degree), scope)
    left = nz.select("z", F.col("nbr").alias("a"), "deg_z")
    right = nz.select("z", F.col("nbr").alias("b"))
    return (
        left.join(right, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.lit(1.0) / F.col("deg_z")).alias("score"))
    )


def jaccard_coefficient(
    edges: DataFrame,
    max_degree: int | None = 10_000,
    min_common: int = 1,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Jaccard link-prediction coefficient:
    score(a,b) = |N(a)∩N(b)| / |N(a)∪N(b)|
               = common / (deg(a) + deg(b) − common).

    The intersection is counted over shared neighbors of degree ≤
    ``max_degree`` (the family's quadratic-join bound — a mega-hub
    shared neighbor adds deg² candidate pairs while dragging every
    score toward 0); the denominator uses the TRUE degrees of a and b
    (degrees are one cheap aggregation, no quadratic risk), so when the
    cap never binds this is the exact textbook coefficient. Pairs with
    fewer than ``min_common`` capped shared neighbors are dropped
    (their score would be ~0 and the pair universe quadratic)."""
    common = common_neighbors(
        edges, max_degree=max_degree, min_common=min_common, scope=scope
    )
    und = canonical_undirected(edges)
    full_deg = (
        und.select(F.col("a").alias("n")).unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        common.join(full_deg.withColumnRenamed("n", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(full_deg.withColumnRenamed("n", "b"), "b")
        .withColumnRenamed("deg", "deg_b")
        .select(
            "a",
            "b",
            (
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
            ).alias("score"),
        )
    )
