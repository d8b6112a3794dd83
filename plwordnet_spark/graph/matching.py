"""Maximal matching — distributed symmetry breaking on EDGES.

The edge-side sibling of :mod:`plwordnet_spark.graph.mis` (Luby-style
local-minimum rounds, Israeli–Itai 1986): an inclusion-maximal set of
vertex-disjoint edges. On a link graph a maximal matching pairs pages
that link each other off into disjoint couples — the primitive under
graph coarsening (pair-and-contract multilevel partitioners), load
balancing, and one-to-one dedup assignment.

Round structure (all DataFrame ops):

1. priority p(u, v, r) = ((u mod P)·A + (v mod P)·B₂ + r·B + seed)
   mod P over the canonical (u < v) active edge — the same exact-int64
   congruential family as mis/walks so ANY engine replays it
   ((P−1)·A < 2^61, no overflow). Total order via the (p, u, v)
   struct.
2. per-vertex best: explode each edge to its two endpoints, groupBy
   vertex, min of the (p, u, v) struct — composite min folds
   map-side, so a hub costs one row per map partition.
3. an edge is MATCHED iff it is the best at BOTH endpoints — the
   globally minimum active edge always qualifies, so every round
   settles ≥1 edge and real graphs collapse in O(log m) rounds.
4. drop every edge touching a matched vertex (left_anti on the
   matched-vertex set); repeat until no active edge.

Per-round envelope: one explode + one partial-agg shuffle + two
hash joins against the shrinking matched set — BFS-frontier-sized
work, lineage truncated per round with eager localCheckpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["maximal_matching", "vertex_cover", "MATCH_P", "MATCH_A", "MATCH_B", "MATCH_B2"]

MATCH_P = 2_147_483_647  # 2^31 − 1
MATCH_A = 1_103_515_245
MATCH_B = 40_503
MATCH_B2 = 69_069


def _priority(u, v, r: int, seed: int):
    return (
        (u % MATCH_P) * F.lit(MATCH_A)
        + (v % MATCH_P) * F.lit(MATCH_B2)
        + F.lit(r * MATCH_B + seed)
    ) % MATCH_P


def maximal_matching(
    spark: SparkSession,
    edges: DataFrame,
    seed: int = 17,
    max_rounds: int = 64,
) -> DataFrame:
    """(u, v, match_round) — a maximal matching of the undirected simple
    graph of ``edges`` (self-loops dropped, direction ignored, u < v in
    the output); ``match_round`` is the 1-based round the pair settled.

    Deterministic for a given (edge set, seed) on any engine and any
    partitioning; see module docstring.
    """
    active = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    matched_acc: list[DataFrame] = []
    r = 1
    while r <= max_rounds:
        if active.isEmpty():
            break
        pe = active.select(
            "u", "v", _priority(F.col("u"), F.col("v"), r, seed).alias("p")
        )
        key = F.struct("p", "u", "v")
        best = (
            pe.select(F.explode(F.array("u", "v")).alias("node"), key.alias("k"))
            .groupBy("node")
            .agg(F.min("k").alias("best"))
        )
        win = (
            pe.join(best.withColumnRenamed("node", "u").withColumnRenamed("best", "bu"), "u")
            .join(best.withColumnRenamed("node", "v").withColumnRenamed("best", "bv"), "v")
            .filter((key == F.col("bu")) & (key == F.col("bv")))
            .select("u", "v", F.lit(r).alias("match_round"))
            .localCheckpoint(eager=True)
        )
        matched_acc.append(win)
        gone = win.select(F.explode(F.array("u", "v")).alias("node")).distinct()
        active = (
            active.join(gone.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(gone.withColumnRenamed("node", "v"), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        r += 1

    if not matched_acc:
        return active.select(
            "u", "v", F.lit(0).alias("match_round")
        ).limit(0)
    out = matched_acc[0]
    for w in matched_acc[1:]:
        out = out.unionByName(w)
    return out.select("u", "v", "match_round").localCheckpoint(eager=True)


def vertex_cover(spark, edges, **matching_kwargs):
    """2-approximate minimum vertex cover: both endpoints of a maximal
    matching — (id) rows. Gavril/Yannakakis: any maximal matching's
    endpoint set covers every edge (an uncovered edge could extend the
    matching, contradicting maximality) and is at most 2x the optimum
    (any cover must hit each matched edge at least once). Same cost as
    :func:`maximal_matching` plus one endpoint explode + distinct.
    Web-graph use: minimal seed set that touches every link for
    verification crawls / monitor placement."""
    m = maximal_matching(spark, edges, **matching_kwargs)
    return (
        m.select(F.col("u").alias("id"))
        .unionByName(m.select(F.col("v").alias("id")))
        .distinct()
    )
