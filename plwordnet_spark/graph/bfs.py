"""Unweighted shortest-path distances (multi-source BFS).

Distance flooding on the Pregel runner — the hash-min pattern of
``graph.components._hashmin`` carrying ``min(dist)+1`` instead of
``min(id)``: per round one join (frontier dists onto edges) + one
groupBy(min) gather, both with map-side partial aggregation, state is
one (id, dist) row per node. Converges in O(eccentricity) rounds; at
web scale each round's traffic is the changed frontier's rows, never
the edge table (cached, partition-local).

Beyond the reference (its graphs go to networkx for path queries,
SURVEY.md §2.10); included because hop-distance from seed sets (e.g.
trusted domains) is a standard link-graph signal. Goldens vs a
pure-Python BFS; the driver oracle is a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.graph.pregel import PregelRunner, PregelResult, loop_tuning

__all__ = ["bfs_distances", "sssp_distances"]


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
    """edges(src, dst, …) → (id, dist) with dist = min #hops from any
    source id (long; NULL = unreachable within max_iterations)."""
    if isinstance(sources, DataFrame):
        src_ids = sources.select("id")
    else:
        src_ids = spark.createDataFrame([(int(s),) for s in sources], "id long")
    ids = (
        (nodes.select("id") if nodes is not None else
         edges.select(F.col("src").alias("id"))
         .unionByName(edges.select(F.col("dst").alias("id"))))
        .distinct()
        .cache()
    )
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        sym = sym.unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
    sym = sym.filter("u != v").distinct().repartition("u").cache()
    n_sym = sym.count()

    init = ids.join(
        src_ids.withColumn("dist", F.lit(0).cast("long")), "id", "left"
    ).select("id", "dist")

    def step(state: DataFrame) -> DataFrame:
        # scatter dist+1 along out-edges of currently-reached nodes only
        # (the frontier superset); gather min per destination
        nbr = (
            sym.join(
                state.filter(F.col("dist").isNotNull()).withColumnRenamed("id", "u"),
                "u",
            )
            .groupBy(F.col("v").alias("id"))
            .agg((F.min("dist") + 1).alias("nbr_dist"))
        )
        return state.join(nbr, "id", "left").select(
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
    with loop_tuning(spark, n_sym):
        res = runner.run(init, step, delta)
    sym.unpersist()
    ids.unpersist()
    return res


def sssp_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int] | DataFrame,
    weight_col: str = "weight",
    nodes: DataFrame | None = None,
    directed: bool = True,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> PregelResult:
    """Weighted single/multi-source shortest paths (Bellman-Ford rounds):
    each round relaxes every edge once — dist(v) = min(dist(v),
    min_u(dist(u) + w(u,v))) — a single join + min-gather, converging in
    ≤ |V| rounds (earlier for small effective diameter). Non-negative
    weights assumed (distances are monotone; convergence check is exact
    equality). NULL dist = unreachable. Like BFS, this is a
    deterministic single-valued iteration: fixed-round runs are
    oracle-replayable whether or not the fixpoint landed."""
    if isinstance(sources, DataFrame):
        src_ids = sources.select("id")
    else:
        src_ids = spark.createDataFrame([(int(s),) for s in sources], "id long")
    ids = (
        (nodes.select("id") if nodes is not None else
         edges.select(F.col("src").alias("id"))
         .unionByName(edges.select(F.col("dst").alias("id"))))
        .distinct()
        .cache()
    )
    rel = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.col(weight_col).cast("double").alias("w"),
    )
    if not directed:
        rel = rel.unionByName(
            edges.select(
                F.col("dst").alias("u"), F.col("src").alias("v"),
                F.col(weight_col).cast("double").alias("w"),
            )
        )
    rel = rel.filter("u != v").groupBy("u", "v").agg(F.min("w").alias("w"))
    rel = rel.repartition("u").cache()
    n_rel = rel.count()

    init = ids.join(
        src_ids.withColumn("dist", F.lit(0.0)), "id", "left"
    ).select("id", "dist")

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
