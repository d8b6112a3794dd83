"""Distance-based centralities (harmonic, closeness) over web graphs.

Shortest-path centralities rank pages by how close they sit to the rest
of the graph — harmonic centrality in particular is the standard
"importance without PageRank's random surfer" measure for web crawls
(Boldi & Vigna, "Axioms for centrality", Internet Math 2014) and is what
the Common Crawl host-ranking releases publish alongside PageRank.

Definitions over hop distances d(u, v):

* harmonic(v)  = Σ_{u≠v, d<∞} 1 / d(u, v)       — sums only reached
  pairs, so disconnected graphs need no special-casing.
* closeness(v) = (r(v) − 1)² / (Σ_{u} d(u, v) · (n − 1)) — the
  Wasserman-Faust component-normalized form (networkx's
  ``wf_improved``), where r(v) is the size of v's reachable set and n
  the graph's node count; isolated-pair-free and comparable across
  components.

Exact computation is all-sources BFS. The engine already has the right
primitive: :func:`plwordnet_spark.graph.bfs.landmark_distances` runs K
BFS floods as ONE composite-key Pregel loop — every edge scan and every
shuffle shared across sources (measured 4.61× over sequential floods at
K=8, BENCH/LANDMARKS.md). Exact mode feeds it ALL node ids; at web
scale you pass ``sample`` landmarks instead and the same estimator
becomes the standard pivot-sampling approximation (Eppstein-Wang):
centralities are then computed from the K-landmark distance vectors and
scaled by n/K. Both modes are the same job shape — the sparse
(id, landmark, dist) composite state — so the exact small-graph oracle
check certifies the code path the sampled web-scale run uses.

Cost model at 10^12 edges: exact is Θ(n) floods and exists for tests /
small subgraphs only; sampled-K keeps the state at Σ reached pairs ≤
n·K rows, i.e. the same memory envelope as K PageRank vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.graph.bfs import landmark_distances

__all__ = ["harmonic_centrality", "closeness_centrality"]


def _all_node_ids(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def _distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list[int] | None,
    directed: bool,
    max_iterations: int,
) -> DataFrame:
    if sources is None:
        sources = _all_node_ids(edges)
    res = landmark_distances(
        spark, edges, sources, directed=directed, max_iterations=max_iterations
    )
    # distances FROM each landmark; for centrality of v we need d(u, v)
    # over sources u — on the undirected default both readings coincide,
    # for directed graphs landmark_distances flooding edge direction
    # yields d(landmark → id), i.e. exactly Σ over in-paths at `id`.
    return res.state.filter(F.col("dist") > 0)


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list[int] | None = None,
    directed: bool = False,
    max_iterations: int = 100,
    scale: float | None = None,
) -> DataFrame:
    """(id, harmonic) — Σ 1/d over reached source-distance pairs.

    ``sources=None`` = exact (all nodes — test/small-graph mode);
    a K-row sources frame = Eppstein-Wang sampled estimate, which you
    typically rescale by ``scale = n / K``."""
    d = _distances(spark, edges, sources, directed, max_iterations)
    h = d.groupBy("id").agg(
        F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic")
    )
    if scale is not None:
        h = h.select("id", (F.col("harmonic") * F.lit(scale)).alias("harmonic"))
    return h


def closeness_centrality(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list[int] | None = None,
    directed: bool = False,
    max_iterations: int = 100,
) -> DataFrame:
    """(id, closeness) — Wasserman-Faust component-normalized closeness.

    Exact when ``sources=None``; with sampled sources the per-node
    reachable count r(v) is estimated from the sample too, so the
    formula degrades gracefully to the sampled estimator."""
    d = _distances(spark, edges, sources, directed, max_iterations)
    n_nodes = _all_node_ids(edges).count()
    agg = d.groupBy("id").agg(
        F.sum("dist").alias("total_dist"),
        F.count("*").alias("n_reached_others"),
    )
    r_minus_1 = F.col("n_reached_others").cast("double")
    return agg.select(
        "id",
        (
            (r_minus_1 * r_minus_1)
            / (F.col("total_dist") * F.lit(float(n_nodes - 1)))
        ).alias("closeness"),
    )
