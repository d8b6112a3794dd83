"""Borůvka minimum spanning forest over a weighted edge table.

The web-graph uses: bottleneck-distance clustering of the host graph
(single-linkage dendrogram = MSF order), cheapest-backbone extraction
of a similarity graph before expensive pairwise verification (connect
every near-dup cluster at minimum total edge weight), and the classic
systems demo that Borůvka — unlike Prim/Kruskal — is embarrassingly
parallel: every component picks its minimum outgoing edge
simultaneously, components merge, and the component count at least
halves per round, so the loop runs O(log n) rounds regardless of
graph shape. The reference has no MSF, but its graph toolkit
(plwordnet_handler/base/structure/graph.py builds NetworkX graphs
where nx.minimum_spanning_tree is one call away) makes it part of the
expected surface for a graph engine.

With DISTINCT edge weights the MSF is UNIQUE — independent of
algorithm and iteration order — which is what makes an exact oracle
possible: any correct MST computation must produce the identical edge
set. Callers with duplicate weights get determinism by pre-mixing a
tie-break into the weight (see the q_msf contract query's injective
congruential scramble).

Scale shape per round:
* candidate selection — the labeled edge list aggregates
  min(weight) per component with map-side partial agg (the same
  absorb-the-hub shape as the PageRank gather: a component with 10^9
  outgoing edges folds to one row per map partition);
* the winning edges are recovered by a join on weight against the
  (components)-sized candidate table — one row per live component,
  halving every round, so AQE flips it to a broadcast join as soon as
  it fits (it is left as an equi-join, not a forced broadcast, because
  round 1's candidate table is vertex-count-sized);
* merging runs large-star/small-star connected components ON THE
  CONTRACTED COMPONENT GRAPH (nodes = current components, edges =
  this round's winners), never on the full graph — its input also
  halves per round, and its own round count is O(log) — then one
  relabel join updates the per-vertex labels.
Total: O(log n) Borůvka rounds, each O(log) small-graph CC rounds on
geometrically shrinking input; per-vertex state is one long label.
localCheckpoint truncates lineage each round (same discipline as
graph/pregel.py loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.graph.components import connected_components

__all__ = ["minimum_spanning_forest"]


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    *,
    weight_col: str = "w",
    max_rounds: int = 40,
) -> DataFrame:
    """(a, b, w) — the minimum spanning forest of the undirected graph.

    ``edges``: (src, dst, weight_col); direction is ignored, self-loops
    dropped, parallel edges collapsed to their minimum weight. Weights
    must be distinct for a unique answer (callers should mix a
    deterministic tie-break into the weight otherwise); with distinct
    weights the result is the unique MSF, one row per forest edge with
    ``a < b``.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint()
    )
    forest = spark.createDataFrame([], "a long, b long, w double")

    for _ in range(max_rounds):
        lab = (
            und.join(
                labels.select(F.col("id").alias("a"), F.col("comp").alias("ca")),
                "a",
            )
            .join(
                labels.select(F.col("id").alias("b"), F.col("comp").alias("cb")),
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint()
        )
        # min outgoing weight per live component (map-side partial agg
        # absorbs component-size skew); distinct weights make the weight
        # itself the edge's identity
        winner_w = (
            lab.select(F.col("ca").alias("comp"), "w")
            .unionByName(lab.select(F.col("cb").alias("comp"), "w"))
            .groupBy("comp")
            .agg(F.min("w").alias("w"))
            .select("w")
            .distinct()
        )
        new_edges = und.join(winner_w, "w").select("a", "b", "w")
        if new_edges.isEmpty():
            break
        forest = forest.unionByName(new_edges).localCheckpoint()
        # contract: CC on the component graph only (winners' label pairs)
        comp_edges = (
            lab.join(winner_w, "w")
            .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        )
        merged = connected_components(spark, comp_edges).state.select(
            F.col("id").alias("comp"), F.col("component").alias("new_comp")
        )
        labels = (
            labels.join(merged, "comp", "left")
            .select(
                "id",
                F.coalesce("new_comp", F.col("comp")).alias("comp"),
            )
            .localCheckpoint()
        )
    return forest
