"""Deterministic weighted random walks — the DeepWalk/node2vec
training-data primitive over the link graph.

A graph-embedding pipeline's input is a corpus of random-walk node
sequences (walks become "sentences" for a skip-gram model). At web
scale that corpus is produced distributively: every walker advances one
hop per superstep, so the whole frontier shares one join against the
edge table per step — the same shared-scan shape as ``ppr_batch`` and
``landmark_distances``, here applied to sampling instead of scoring.

**Sampling is deterministic and engine-portable by construction.** Each
(start, walk, step) draws u ∈ [0,1) from a multiplicative-congruential
mix computed with pure mod-p bigint arithmetic (p = 1,000,003; every
intermediate ≤ ~10¹², far inside int64 even under ANSI overflow
checks), and picks the neighbor whose cumulative-weight span on the
precomputed per-src CDF contains u:

    u = mix(start mod p, walk, step, seed) / p
    next = the neighbor with cdf_lo <= u < cdf_hi   (per current node)

The same arithmetic replays verbatim in DuckDB SQL (the driver
oracle) — which no library RNG would allow; and because the CDF weights
are integral edge multiplicities, the boundary doubles are bit-identical
across engines (exact integer sums, same dst accumulation order). The
statistical quality is LCG-grade — ample for embedding corpora
(DeepWalk results are robust to RNG choice), not for cryptography or
Monte-Carlo error bars; swap :func:`walk_u_expr` for xxhash64 mixing
when cross-engine replay is not needed.

Scale shape per superstep: one equi-join of the walker frontier against
the cached, src-partitioned CDF table, with the containment filter
keeping EXACTLY ONE out-edge per walker — Σ deg(cur) candidate rows are
produced but only |walkers| survive, pruned by a filter sitting
directly on the join. Walk identity is the composite (start, walk), so
arbitrary 64-bit node ids (xxhash64 ids included) never overflow a
packed id. Walks stop early at dangling nodes (inner join drops them —
DeepWalk sink semantics).

The per-step frontier is eagerly localCheckpoint'ed: the output plan
references every step, and without cuts the lineage would nest L joins
deep. Corpus generation is write-once — materialize the result promptly
(the checkpoint blocks live until the returned plan is garbage
collected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["random_walks", "node2vec_walks", "skipgram_pairs", "walk_u_expr"]

_P = 1_000_003
_R1 = 743_177
_R2 = 499_979
_R3 = 104_729
_R4 = 15_485_863
_C = 12_345


def walk_u_expr(start_col, walk_col, step: int, seed: int):
    """u ∈ [0,1) for (start, walk, step, seed): two rounds of mod-p
    congruential mixing, every intermediate ≤ ~7.5×10¹¹ (ANSI-safe),
    identical in any engine with 64-bit integers and IEEE doubles."""
    h = (
        F.pmod(start_col, F.lit(_P)) * F.lit(_R1)
        + F.pmod(walk_col * F.lit(_R4), F.lit(_P))
        + F.lit((step * _R2) % _P)
        + F.lit((seed * _R3 + _C) % _P)
    )
    h = F.pmod(h, F.lit(_P))
    h = F.pmod(h * F.lit(_R2) + F.lit(_C), F.lit(_P))
    return h.cast("double") / F.lit(float(_P))


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 42,
    weighted: bool = True,
    start_nodes: DataFrame | None = None,
) -> DataFrame:
    """→ (start, walk, step, node): ``walks_per_node`` weighted random
    walks from every start node (default: every node with ≥1 out-edge),
    each advancing ``walk_length`` hops or stopping early at a dangling
    node. ``walk`` ∈ [0, walks_per_node); step 0 is the start itself.

    Deterministic for a fixed (graph, walk_length, walks_per_node,
    seed) — independent of partitioning, engine, or run order.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    weight_col = (
        F.col("weight") if weighted and "weight" in edges.columns else F.lit(1.0)
    )
    edge_w = (
        edges.select("src", "dst", weight_col.cast("double").alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )

    # per-src cumulative-share CDF, neighbors in dst order: the spans
    # [cdf_lo, cdf_hi) tile [0, 1) exactly
    w_tot = Window.partitionBy("src")
    w_cum = Window.partitionBy("src").orderBy("dst").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = (
        edge_w.withColumn("_tot", F.sum("w").over(w_tot))
        .withColumn("_cum", F.sum("w").over(w_cum))
        .select(
            "src",
            "dst",
            ((F.col("_cum") - F.col("w")) / F.col("_tot")).alias("cdf_lo"),
            (F.col("_cum") / F.col("_tot")).alias("cdf_hi"),
        )
        .repartition("src")
        .cache()
    )
    cdf.count()

    starts = (
        start_nodes.select(F.col("id").alias("start"))
        if start_nodes is not None
        else edge_w.select(F.col("src").alias("start")).distinct()
    )
    frontier = starts.select(
        "start",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("walk"),
        F.col("start").alias("node"),
    )

    out = frontier.select("start", "walk", F.lit(0).alias("step"), "node")
    for step in range(1, walk_length + 1):
        u = walk_u_expr(F.col("start"), F.col("walk"), step, seed)
        frontier = (
            frontier.withColumnRenamed("node", "src")
            .join(cdf, "src")
            .withColumn("_u", u)
            .filter((F.col("cdf_lo") <= F.col("_u")) & (F.col("_u") < F.col("cdf_hi")))
            .select("start", "walk", F.col("dst").alias("node"))
        )
        frontier = frontier.localCheckpoint(eager=True)
        out = out.unionByName(
            frontier.select("start", "walk", F.lit(step).alias("step"), "node")
        )
    cdf.unpersist()
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n) skip-gram co-occurrence pairs from a walk
    corpus — the DeepWalk/node2vec training-data step (Perozzi et al.
    KDD'14 §4.2): within each walk sequence, every pair of nodes at
    distance 1..``window`` co-occurs, in BOTH orientations (the
    word2vec window is symmetric).

    Input is :func:`random_walks` output (start, walk, step, node);
    ``n`` is the pair's multiplicity over the whole corpus (keep it —
    SGNS consumes weighted pairs; divide by it to de-duplicate).

    Shape: one shuffle on (start, walk) for the window pass — ``window``
    ``lead`` columns materialize per row, exploded and mirrored, then a
    partial-agg count. No self-join: the walk corpus (N·walks·length
    rows, the 100 TB side at scale) is scanned once.
    """
    from pyspark.sql import Window as W

    if window < 1:
        raise ValueError("window must be >= 1")
    spec = W.partitionBy("start", "walk").orderBy("step")
    leads = [F.lead("node", k).over(spec).alias(f"_l{k}") for k in range(1, window + 1)]
    fwd = (
        walks.select("node", *leads)
        .select(
            F.col("node").alias("center"),
            F.explode(F.array(*[F.col(f"_l{k}") for k in range(1, window + 1)])).alias(
                "context"
            ),
        )
        .filter(F.col("context").isNotNull())
    )
    both = fwd.unionByName(
        fwd.select(F.col("context").alias("center"), F.col("center").alias("context"))
    )
    return both.groupBy("center", "context").agg(F.count(F.lit(1)).alias("n"))


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 1,
    seed: int = 42,
    weighted: bool = True,
    start_nodes: DataFrame | None = None,
) -> DataFrame:
    """Second-order (node2vec) biased walks: like :func:`random_walks`,
    but the transition out of ``cur`` re-weights each out-edge
    ``cur→next`` by the walker's PREVIOUS node (Grover & Leskovec, KDD
    2016 §3.2): ×1/p if ``next == prev`` (return), ×1 if the edge
    ``prev→next`` exists (stay in prev's neighborhood — directed
    convention here), ×1/q otherwise (explore). p > 1 discourages
    backtracking, q > 1 keeps walks local (BFS-like), q < 1 pushes them
    outward (DFS-like).

    Implementation is the alias-table analog in join form: the
    second-order CDF is PRECOMPUTED over all (prev, cur, next) wedges —
    one self-join + one membership left-join + one (prev, cur) window —
    and each superstep is then exactly the first-order plan: one
    equi-join of the frontier against the cached CDF on (prev, cur),
    the u-span filter keeping one edge per walker. Step 1 has no prev
    and draws from the first-order CDF, stored in the same table under
    the sentinel ``prev = -1`` (node ids must be >= 0), so every step
    is ONE join against ONE table.

    The wedge table is node2vec's documented memory cost — Σ_cur
    in-deg(cur)·out-deg(cur) rows, quadratic at hub nodes (the same
    landmine q_triad_census and linkpred name; cap hubs upstream if the
    graph needs it). Sampling reuses :func:`walk_u_expr`, so sequences
    stay deterministic and engine-replayable; with p, q powers of two
    the bias arithmetic is exact in IEEE doubles and the DuckDB oracle
    replays the identical sequences.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    weight_col = (
        F.col("weight") if weighted and "weight" in edges.columns else F.lit(1.0)
    )
    edge_w = (
        edges.select("src", "dst", weight_col.cast("double").alias("w"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .cache()
    )

    def _spans(df: DataFrame, keys: list[str]) -> DataFrame:
        w_tot = Window.partitionBy(*keys)
        w_cum = Window.partitionBy(*keys).orderBy("dst").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            df.withColumn("_tot", F.sum("w").over(w_tot))
            .withColumn("_cum", F.sum("w").over(w_cum))
            .select(
                *keys,
                "dst",
                ((F.col("_cum") - F.col("w")) / F.col("_tot")).alias("cdf_lo"),
                (F.col("_cum") / F.col("_tot")).alias("cdf_hi"),
            )
        )

    cdf1 = _spans(edge_w, ["src"]).select(
        F.lit(-1).cast("long").alias("prev"), "src", "dst", "cdf_lo", "cdf_hi"
    )
    a = edge_w.select(F.col("src").alias("prev"), F.col("dst").alias("src"))
    b = edge_w.select("src", "dst", "w")
    chk = edge_w.select(
        F.col("src").alias("prev"), F.col("dst").alias("dst"), F.lit(1).alias("_adj")
    )
    wedge = (
        a.join(b, "src")
        .join(chk, ["prev", "dst"], "left")
        .select(
            "prev",
            "src",
            "dst",
            F.when(F.col("dst") == F.col("prev"), F.col("w") / F.lit(float(p)))
            .when(F.col("_adj").isNotNull(), F.col("w"))
            .otherwise(F.col("w") / F.lit(float(q)))
            .alias("w"),
        )
    )
    cdf_all = (
        cdf1.unionByName(_spans(wedge, ["prev", "src"]))
        .repartition("prev", "src")
        .cache()
    )
    cdf_all.count()
    edge_w.unpersist()

    starts = (
        start_nodes.select(F.col("id").alias("start"))
        if start_nodes is not None
        else cdf_all.filter(F.col("prev") == -1)
        .select(F.col("src").alias("start"))
        .distinct()
    )
    frontier = starts.select(
        "start",
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("walk"),
        F.lit(-1).cast("long").alias("prev"),
        F.col("start").alias("node"),
    )
    out = frontier.select("start", "walk", F.lit(0).alias("step"), "node")
    for step in range(1, walk_length + 1):
        u = walk_u_expr(F.col("start"), F.col("walk"), step, seed)
        frontier = (
            frontier.withColumnRenamed("node", "src")
            .join(cdf_all, ["prev", "src"])
            .withColumn("_u", u)
            .filter((F.col("cdf_lo") <= F.col("_u")) & (F.col("_u") < F.col("cdf_hi")))
            .select(
                "start",
                "walk",
                F.col("src").alias("prev"),
                F.col("dst").alias("node"),
            )
        )
        frontier = frontier.localCheckpoint(eager=True)
        out = out.unionByName(
            frontier.select("start", "walk", F.lit(step).alias("step"), "node")
        )
    cdf_all.unpersist()
    return out
