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
from plwordnet_spark.graph.pregel import PregelResult, PregelRunner, loop_tuning

__all__ = [
    "closeness_centrality",
    "eigenvector_centrality",
    "harmonic_centrality",
]


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


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    max_iterations: int = 100,
    tol: float = 1e-8,
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> PregelResult:
    """Eigenvector centrality: the dominant left eigenvector of the
    adjacency matrix — x_{t+1} = normalize(Aᵀ x_t), the un-damped,
    un-degree-normalized member of the PageRank/Katz/HITS family
    (Bonacich 1972). Completes the centrality set: score flows along
    in-links weighted by the SOURCE's own score, with no teleport
    (PageRank) and no additive beta (Katz).

    Per iteration: one rank join on src + one groupBy(dst) gather with
    map-side partial aggregation, then an L2 normalize via a broadcast
    one-row aggregate — the exact PageRank shuffle shape, so every
    skew/scale property measured there (BENCH/SKEW.md) carries over.
    ``tol=0.0`` runs exactly ``max_iterations`` (fixed-k, what the SQL
    oracle replays). Convergence requires the usual primitivity caveat
    (reducible/periodic graphs may oscillate — the fixed-k contract
    sidesteps it; callers wanting guaranteed convergence damp via
    ``pagerank`` instead)."""
    w = F.col("weight") if weighted and "weight" in edges.columns else F.lit(1.0)
    links = edges.select("src", "dst", w.cast("double").alias("w")).filter(
        "src != dst"
    ).repartition("src").cache()
    ids = (
        links.select(F.col("src").alias("id"))
        .unionByName(links.select(F.col("dst").alias("id")))
        .distinct()
        .repartition("id")
        .cache()
    )
    n_nodes = ids.count()
    if n_nodes == 0:
        links.unpersist()
        return PregelResult(
            state=spark.createDataFrame([], "id long, score double"),
            iterations=0,
            converged=True,
        )
    links.count()
    init = ids.select("id", F.lit(1.0 / n_nodes).alias("score"))

    def step(state: DataFrame) -> DataFrame:
        gathered = (
            state.join(links, state["id"] == links["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("score") * F.col("w")).alias("raw"))
        )
        filled = ids.join(gathered, "id", "left").select(
            "id", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        norm = filled.agg(F.sqrt(F.sum(F.col("raw") ** 2)).alias("_n"))
        return filled.crossJoin(F.broadcast(norm)).select(
            "id",
            F.when(F.col("_n") > 0, F.col("raw") / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias("score"),
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        return (
            new.alias("n")
            .join(old.alias("o"), "id")
            .agg(F.sum(F.abs(F.col("n.score") - F.col("o.score"))).alias("d"))
            .collect()[0]["d"]
        )

    runner = PregelRunner(
        spark,
        max_iterations=max_iterations,
        tol=(n_nodes * tol) if tol else None,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
    )
    with loop_tuning(spark, n_nodes):
        result = runner.run(init, step, delta if tol else None)
    ids.unpersist()
    links.unpersist()
    return PregelResult(
        state=result.state,
        iterations=result.iterations,
        converged=result.converged,
        metrics=result.metrics,
    )
