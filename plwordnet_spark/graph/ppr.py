"""Batched personalized PageRank: K seed vectors in ONE composite loop.

The related-pages primitive at web scale: a PPR vector per seed page
(teleport mass concentrated on the seed) scores every page by its
random-walk affinity to that seed. Running K seeds as K separate
`pagerank(personalization=...)` jobs pays K× the per-iteration fixed
cost and K scans of the scatter table per step; this operator applies
the ``landmark_distances`` trick to PPR — state is sparse composite
rows ``(id, seed, rank)``, so all K walks share every edge scan, every
rank join, and every gather shuffle.

Semantics per seed are IDENTICAL to
``pagerank(personalization=one_hot(seed))`` (property-tested to 1e-9):

* teleport + dangling mass both land entirely on the seed node —
  ``rank(seed) += (1-α) + α·dm(seed)``, everything else is the damped
  gather,
* unreached ``(id, seed)`` pairs simply never materialize (their rank
  is exactly 0.0) — state is Σ per-seed reached sets, not n×K up
  front,
* convergence: MAX over seeds of the per-seed L1 delta, against the
  same ``n_nodes · tol`` bound the single-vector path uses (the batch
  runs until its slowest seed converges).

Scale shape: the per-iteration shuffles are ONE rank join on ``src``
(scatter side pre-partitioned and cached, never re-exchanged) and ONE
``groupBy(id, seed)`` gather with map-side partial aggregation — the
composite key spreads each seed's hub traffic across K·n keys. The
per-seed dangling masses are a K-row aggregate that stays distributed
(joined back, never collected). State is referenced three times per
step (gather join, dangling scan, delta), so the loop hard-truncates
lineage every iteration (truncate_interval=1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.graph.pregel import PregelRunner, PregelResult, loop_tuning

__all__ = ["ppr_batch"]


def ppr_batch(
    spark: SparkSession,
    edges: DataFrame,
    seeds: list[int] | DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 100,
    weighted: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> PregelResult:
    """edges(src, dst[, weight]) + K seeds → state (id, seed, rank).

    Seeds absent from the graph's node universe are dropped (parity
    with ``landmark_distances``; a one-hot personalization over a
    missing node has zero total mass). Rows absent from the result are
    exactly-zero ranks.

    **Checkpoint/resume** (same contract as ``pagerank``/``bfs``): with
    ``checkpoint_dir`` set, the composite (id, seed, rank) state is
    durably snapshotted every ``checkpoint_interval`` iterations plus on
    exit; ``resume=True`` restarts from the latest committed snapshot
    (falling back to a fresh run on an empty store) and — the iteration
    being deterministic — converges to the same final state as an
    uninterrupted run with the same ``seeds``/knobs (kill-and-resume
    tested). Callers must pass the SAME seed set on resume; the
    snapshot carries ranks, not the seed roster."""
    weight_col = F.col("weight") if weighted and "weight" in edges.columns else F.lit(1.0)
    edge_w = edges.select("src", "dst", weight_col.cast("double").alias("w"))

    ids = (
        edge_w.select(F.col("src").alias("id"))
        .unionByName(edge_w.select(F.col("dst").alias("id")))
        .distinct()
        .cache()
    )
    n_nodes = ids.count()

    # same list/DataFrame seed handling as the bfs family, deduped on
    # BOTH input forms (a duplicated seed would double its teleport +
    # init mass and break one-hot parity), restricted to the node
    # universe like landmark_distances
    from plwordnet_spark.graph.bfs import _source_ids

    seeds_df = (
        _source_ids(spark, seeds)
        .select(F.col("id").alias("seed"))
        .distinct()
        .join(ids.withColumnRenamed("id", "seed"), "seed", "left_semi")
        .cache()
    )
    n_seeds = seeds_df.count()
    if n_seeds == 0:
        seeds_df.unpersist()
        ids.unpersist()
        return PregelResult(
            state=spark.createDataFrame([], "id long, seed long, rank double"),
            iterations=0,
            converged=True,
        )

    out_w = edge_w.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("out_w"))
    scatter = (
        edge_w.join(out_w.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("share"))
        .repartition("src")
        .cache()
    )
    n_scatter = scatter.count()
    dangling = ids.join(out_w, "id", "left_anti").cache()
    n_dangling = dangling.count()

    init = seeds_df.select(
        F.col("seed").alias("id"), "seed", F.lit(1.0).alias("rank")
    )

    def step(state: DataFrame) -> DataFrame:
        gathered = (
            scatter.join(state.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), "seed")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inc"))
        )
        teleport = seeds_df.select(F.col("seed").alias("id"), "seed")
        if n_dangling > 0:
            dm = (
                state.join(dangling.select("id"), "id")
                .groupBy("seed")
                .agg(F.sum("rank").alias("dm"))
            )
            teleport = teleport.join(dm, "seed", "left").select(
                "id",
                "seed",
                (
                    F.lit(1.0 - alpha)
                    + F.lit(alpha) * F.coalesce(F.col("dm"), F.lit(0.0))
                ).alias("r"),
            )
        else:
            teleport = teleport.select(
                "id", "seed", F.lit(1.0 - alpha).alias("r")
            )
        return (
            gathered.select("id", "seed", (F.lit(alpha) * F.col("inc")).alias("r"))
            .unionByName(teleport)
            .groupBy("id", "seed")
            .agg(F.sum("r").alias("rank"))
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        joined = old.withColumnRenamed("rank", "r0").join(
            new, ["id", "seed"], "full"
        )
        row = (
            joined.groupBy("seed")
            .agg(
                F.sum(
                    F.abs(
                        F.coalesce(F.col("rank"), F.lit(0.0))
                        - F.coalesce(F.col("r0"), F.lit(0.0))
                    )
                ).alias("l1")
            )
            .agg(F.max("l1"))
            .first()
        )
        return float(row[0] or 0.0)

    runner = PregelRunner(
        spark,
        max_iterations=max_iterations,
        tol=n_nodes * tol,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        truncate_interval=1,  # step references state 3x — no soft chains
    )
    if resume and checkpoint_dir is None:
        raise ValueError("resume requires a checkpoint_dir")
    with loop_tuning(spark, n_scatter):
        res = runner.resume(step, delta if tol > 0 else None) if resume else None
        if res is None:  # fresh run, or resume over an empty store
            res = runner.run(init, step, delta if tol > 0 else None)
        state = res.state.select("id", "seed", "rank")
    scatter.unpersist()
    dangling.unpersist()
    seeds_df.unpersist()
    ids.unpersist()
    return PregelResult(
        state=state, iterations=res.iterations, converged=res.converged,
        metrics=res.metrics,
    )
