"""HITS (hubs & authorities) — Kleinberg's link-analysis pair to PageRank.

Power iteration on the un-normalized adjacency: per round
``auth_raw(v) = Σ_{u→v} hub(u)`` then L2-normalize, then
``hub_raw(u) = Σ_{u→v} auth(v)`` then L2-normalize. Each half-round is
one join + one groupBy-sum (map-side combine absorbs hub in-degree
skew); the L2 norms stay relational — a one-row aggregate cross-joined
(broadcast) onto the state, so the driver never collects a vector.
Pregel state is one (id, hub) row per node; authority is derived from
the final hub (consistent pair, identical at convergence).

Beyond the reference (networkx-side there); a first-class link-graph
signal for crawl frontier/quality scoring. Goldens vs a pure-Python
implementation; the driver oracle unrolls fixed-k iterations in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.graph.pregel import PregelRunner, PregelResult, loop_tuning

__all__ = ["hits"]


def hits(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
    tol: float = 1e-8,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    check_interval: int = 1,
) -> PregelResult:
    """edges(src, dst, …) → (id, hub, authority), both L2-normalized.

    ``tol``: converged when the L1 change of the hub vector drops below
    ``n_nodes · tol``; pass ``tol=0.0`` to run exactly max_iterations
    (fixed-k mode — what the driver's SQL oracle replays). Fixed-k mode
    skips the per-iteration delta action entirely (no convergence to
    detect); ``check_interval`` thins it out for tol>0 runs, like
    pagerank's — HITS norms shrink deltas monotonically enough that
    overshooting by check_interval−1 rounds is benign."""
    ids = (
        (nodes.select("id") if nodes is not None else
         edges.select(F.col("src").alias("id"))
         .unionByName(edges.select(F.col("dst").alias("id"))))
        .distinct()
        .repartition("id")
        .cache()
    )
    n_nodes = ids.count()
    if n_nodes == 0:
        return PregelResult(
            state=spark.createDataFrame([], "id long, hub double, authority double"),
            iterations=0,
            converged=True,
        )
    links = (
        edges.select("src", "dst").filter("src != dst").distinct()
        .repartition("src").cache()
    )
    n_links = links.count()

    # state carries HUB ONLY: authority is an intermediate inside each
    # step and is derived once from the final hub after the loop. A
    # (hub, authority) state would reference the auth subtree twice per
    # step (once feeding hub_raw, once carried to the output), and
    # Catalyst does not reuse those subtrees — measured 2× per-iteration
    # aggregation work.
    init = ids.select("id", F.lit(1.0 / n_nodes).alias("hub"))

    # Each half-round's raw gather is persist()ed so the broadcast-norm
    # subtree reads the cache instead of RE-EXECUTING the gather — without
    # the cache, Catalyst gives the one-row norm aggregate its own copy of
    # the whole join+groupBy subtree (no subtree reuse across a broadcast
    # exchange), doubling every iteration's aggregation work (measured:
    # HITS at 10 iters cost ~1.6× PageRank's whole convergence run).
    # Caches from iteration i are released at the start of iteration i+1:
    # by then the runner has eagerly materialized iteration i's state.
    pending_caches: list[DataFrame] = []

    def _mark(df: DataFrame) -> DataFrame:
        df.persist()
        pending_caches.append(df)
        return df

    def _release_caches() -> None:
        for df in pending_caches:
            df.unpersist()
        pending_caches.clear()

    def _l2_normalized(full: DataFrame, col: str, raw: DataFrame) -> DataFrame:
        # the norm is computed from the (cached) pre-join gather output:
        # nodes absent from it are exactly the coalesce-to-0.0 rows, which
        # contribute nothing to an L2 norm
        norm = raw.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
        return (
            full.crossJoin(F.broadcast(norm))
            .withColumn(
                col,
                F.when(F.col("_n") > 0, F.col(col) / F.col("_n")).otherwise(F.lit(0.0)),
            )
            .drop("_n")
        )

    def _auth_of(hub_state: DataFrame) -> DataFrame:
        raw = _mark(
            links.join(
                hub_state.select(F.col("id").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("authority"))
        )
        full = ids.join(raw, "id", "left").select(
            "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
        )
        return _l2_normalized(full, "authority", raw)

    def step(hub_state: DataFrame) -> DataFrame:
        _release_caches()  # previous iteration's state is materialized
        # auth itself is referenced exactly once (hub_raw's join) — only
        # the raw gathers need caching; persisting auth would store a
        # full node vector per iteration for zero reuse
        auth = _auth_of(hub_state)
        hub_raw = _mark(
            links.join(
                auth.select(F.col("id").alias("dst"), "authority"), "dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = ids.join(hub_raw, "id", "left").select(
            "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
        )
        return _l2_normalized(hub, "hub", hub_raw)

    def delta(old: DataFrame, new: DataFrame) -> float:
        return float(
            old.select("id", F.col("hub").alias("h0"))
            .join(new.select("id", "hub"), "id")
            .agg(F.sum(F.abs(F.col("hub") - F.col("h0"))))
            .first()[0]
        )

    runner = PregelRunner(
        spark,
        max_iterations=max_iterations,
        tol=n_nodes * tol,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        check_interval=check_interval,
    )
    with loop_tuning(spark, n_links):
        # fixed-k mode (tol<=0 can never satisfy delta<tol): drop the
        # delta callable so no convergence action runs at all — each
        # iteration is exactly one materializing job
        res = runner.run(init, step, delta if tol > 0 else None)
        _release_caches()
        state = res.state.join(_auth_of(res.state), "id").select(
            "id", "hub", "authority"
        ).localCheckpoint(eager=True)  # materialize INSIDE the tuned block
        # (configs apply at action time) and before releasing caches
        _release_caches()
    links.unpersist()
    ids.unpersist()
    return PregelResult(
        state=state, iterations=res.iterations, converged=res.converged,
        metrics=res.metrics,
    )
