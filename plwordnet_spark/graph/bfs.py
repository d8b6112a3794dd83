"""Shortest-path distances: unweighted BFS and weighted SSSP.

Both are min-plus distance flooding on the Pregel runner — the hash-min
pattern of ``graph.components._hashmin`` carrying ``min(dist + w)``
instead of ``min(id)``: per round one join (reached dists onto edges) +
one groupBy(min) gather, both with map-side partial aggregation, state
is one (id, dist) row per node. BFS is the w≡1 case kept on integer
arithmetic (long distances); SSSP (Bellman-Ford rounds) carries double
weights, converging in ≤ |V| rounds for non-negative weights. At web
scale each round's traffic is the reached-frontier rows, never the
cached edge table.

Beyond the reference (its graphs go to networkx for path queries,
SURVEY.md §2.10); hop/weighted distance from seed sets (e.g. trusted
domains) is a standard link-graph signal. Both are deterministic
single-valued iterations: fixed-round runs are oracle-replayable whether
or not the fixpoint landed. Goldens vs pure-Python BFS/Dijkstra; the
driver oracles are a recursive CTE (BFS) and unrolled relaxation (SSSP).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.graph.pregel import PregelRunner, PregelResult, loop_tuning

__all__ = ["bfs_distances", "sssp_distances"]


def _source_ids(spark: SparkSession, sources: list[int] | DataFrame) -> DataFrame:
    if isinstance(sources, DataFrame):
        return sources.select("id")
    return spark.createDataFrame([(int(s),) for s in sources], "id long")


def _node_ids(edges: DataFrame, nodes: DataFrame | None) -> DataFrame:
    return (
        (nodes.select("id") if nodes is not None else
         edges.select(F.col("src").alias("id"))
         .unionByName(edges.select(F.col("dst").alias("id"))))
        .distinct()
        .cache()
    )


def _min_plus_loop(
    spark: SparkSession,
    rel: DataFrame,  # (u, v, w) cached relaxation edges
    ids: DataFrame,  # cached node universe
    init: DataFrame,  # (id, dist) — 0 at sources, NULL elsewhere
    n_rel: int,
    max_iterations: int,
    checkpoint_dir: str | None,
    checkpoint_interval: int,
) -> PregelResult:
    """dist(v) ← min(dist(v), min_u(dist(u) + w(u,v))) to fixpoint.
    Distances only ever decrease and by exact min, so the convergence
    check is plain (null-aware) inequality."""

    def step(state: DataFrame) -> DataFrame:
        relaxed = (
            rel.join(
                state.filter(F.col("dist").isNotNull()).withColumnRenamed("id", "u"),
                "u",
            )
            .groupBy(F.col("v").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("nbr_dist"))
        )
        return state.join(relaxed, "id", "left").select(
            "id", F.least(F.col("dist"), F.col("nbr_dist")).alias("dist")
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        changed = (
            old.withColumnRenamed("dist", "d0")
            .join(new, "id")
            .filter(
                (F.col("d0").isNull() & F.col("dist").isNotNull())
                | (F.col("d0") != F.col("dist"))
            )
            .count()
        )
        return float(changed)

    runner = PregelRunner(
        spark,
        max_iterations=max_iterations,
        tol=0.5,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
    )
    with loop_tuning(spark, n_rel):
        res = runner.run(init, step, delta)
    rel.unpersist()
    ids.unpersist()
    return res


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int] | DataFrame,
    nodes: DataFrame | None = None,
    directed: bool = False,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> PregelResult:
    """edges(src, dst, …) → (id, dist) with dist = min #hops (long) from
    any source id; NULL = unreachable within max_iterations."""
    src_ids = _source_ids(spark, sources)
    ids = _node_ids(edges, nodes)
    rel = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        rel = rel.unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
    rel = (
        rel.filter("u != v").distinct()
        .withColumn("w", F.lit(1).cast("long"))
        .repartition("u").cache()
    )
    n_rel = rel.count()
    init = ids.join(
        src_ids.withColumn("dist", F.lit(0).cast("long")), "id", "left"
    ).select("id", "dist")
    return _min_plus_loop(
        spark, rel, ids, init, n_rel, max_iterations,
        checkpoint_dir, checkpoint_interval,
    )


def sssp_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int] | DataFrame,
    weight_col: str = "weight",
    nodes: DataFrame | None = None,
    directed: bool = False,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> PregelResult:
    """Weighted shortest paths (double distances); non-negative weights
    assumed. Parallel edges collapse to their minimum weight. Same
    ``directed=False`` default as :func:`bfs_distances` — switching
    between the two on one edge table keeps the same graph."""
    src_ids = _source_ids(spark, sources)
    ids = _node_ids(edges, nodes)

    def _w(col: str) -> Column:
        return F.col(col).cast("double")

    rel = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), _w(weight_col).alias("w")
    )
    if not directed:
        rel = rel.unionByName(
            edges.select(
                F.col("dst").alias("u"), F.col("src").alias("v"),
                _w(weight_col).alias("w"),
            )
        )
    rel = (
        rel.filter("u != v").groupBy("u", "v").agg(F.min("w").alias("w"))
        .repartition("u").cache()
    )
    n_rel = rel.count()
    init = ids.join(
        src_ids.withColumn("dist", F.lit(0.0)), "id", "left"
    ).select("id", "dist")
    return _min_plus_loop(
        spark, rel, ids, init, n_rel, max_iterations,
        checkpoint_dir, checkpoint_interval,
    )
