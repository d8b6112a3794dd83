"""Benchmark harness — one JSON line on stdout.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

* flagship: PageRank-to-convergence on the synthetic link graph
  (corpus → extraction → edge table → power iteration) — the north-rule
  metric, reported as edges·iterations/sec,
* connected components (large-star/small-star) on the same edge table,
* TPC-H-ish scan/agg, multi-join, window top-k on lineitem/orders,
* MinHash-LSH dedup over documents, exact cosine top-k over embeddings.

Output: {"metric": ..., "value": seconds_total, "unit": "sec",
"queries": {name: sec}, "sf": ..., "pagerank": {...detail...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from plwordnet_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "50000"))
SEED = 42


def main() -> None:
    spark = get_spark(app_name="plwordnet-spark-bench", master=f"local[{CPUS}]")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    detail: dict = {}

    def timed(name: str, fn):
        start = time.time()
        out = fn()
        timings[name] = round(time.time() - start, 3)
        return out

    # --- flagship: corpus → graph → PageRank to convergence ---
    from plwordnet_spark.corpus import generate_pages
    from plwordnet_spark.graph.build import build_graph
    from plwordnet_spark.graph.components import connected_components
    from plwordnet_spark.graph.pagerank import pagerank

    pages = generate_pages(spark, N_PAGES, SEED).cache()
    pages.count()  # corpus generation excluded from graph timings

    def _build():
        tables = build_graph(pages)
        tables.edges.cache()
        n_edges = tables.edges.count()
        return tables, n_edges

    tables, n_edges = timed("graph_build", _build)

    def _pr():
        return pagerank(
            spark, tables.edges, nodes=tables.nodes, tol=1e-6, max_iterations=60
        )

    pr = timed("pagerank_convergence", _pr)
    pr_sec = timings["pagerank_convergence"]
    detail["pagerank"] = {
        "n_pages": N_PAGES,
        "n_edges": n_edges,
        "iterations": pr.iterations,
        "converged": pr.converged,
        "edges_per_sec": round(n_edges * pr.iterations / pr_sec, 1),
        "cpus": CPUS,
    }

    def _pr_csr():
        return pagerank(
            spark, tables.edges, nodes=tables.nodes, tol=1e-6, max_iterations=60,
            use_csr=True,
        )

    pr_csr = timed("pagerank_csr", _pr_csr)
    detail["pagerank"]["csr_edges_per_sec"] = round(
        n_edges * pr_csr.iterations / timings["pagerank_csr"], 1
    )

    timed(
        "connected_components",
        lambda: connected_components(spark, tables.edges, nodes=tables.nodes).state.count(),
    )

    from plwordnet_spark.graph.bfs import bfs_distances
    from plwordnet_spark.graph.hits import hits
    from plwordnet_spark.graph.kcore import k_core

    seed_ids = tables.nodes.orderBy("id").limit(1).select("id")
    timed(
        "bfs",
        lambda: bfs_distances(spark, tables.edges, sources=seed_ids, nodes=tables.nodes)
        .state.filter("dist IS NOT NULL").count(),
    )
    timed(
        "hits",
        lambda: hits(spark, tables.edges, nodes=tables.nodes, max_iterations=10, tol=0.0)
        .state.count(),
    )
    timed("kcore", lambda: k_core(spark, tables.edges, k=3).state.count())

    # --- relational headliners on the driver tables ---
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")

    timed(
        "scan_agg_q1",
        lambda: lineitem.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect(),
    )
    timed(
        "multi_join_revenue",
        lambda: orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .collect(),
    )
    from pyspark.sql import Window as W

    timed(
        "window_topk",
        lambda: orders.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
            ),
        )
        .filter(F.col("rk") <= 3)
        .count(),
    )

    # --- training-data ops ---
    from plwordnet_spark.textops.dedup import minhash_lsh_dedup
    from plwordnet_spark.vectors.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")

    def _dedup():
        kept, pairs = minhash_lsh_dedup(spark, docs, threshold=0.8)
        return kept.count(), pairs.count()

    detail["minhash"] = dict(zip(("kept", "dup_pairs"), timed("minhash_dedup", _dedup)))

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # median of 3 reps: round-2's apparent 1.08→1.77 s "regression" was
    # first-run warm-up + host variance (interleaved reps stabilize at
    # ~0.8 s; rep0 alone can read 4×) — a single cold measurement of a
    # sub-second query is noise, so this row reports the median and keeps
    # the raw reps in detail
    cosine_reps = []
    for _ in range(3):
        t0 = time.time()
        cosine_topk(emb, queries_df, k=10).count()
        cosine_reps.append(round(time.time() - t0, 3))
    timings["cosine_topk"] = sorted(cosine_reps)[1]
    detail["cosine_topk_reps"] = cosine_reps

    # reference comparison: the reference's only published throughput is
    # 370.45 per-id vector point-lookups/sec (single-threaded Milvus loop,
    # /root/reference/INSTALL.md:243-244). Two honest measurements:
    # (a) the same sequential loop shape — N independent per-id filter
    #     queries, one Spark job each (apples-to-apples with the loop),
    # (b) the batch formulation a Spark user would actually write —
    #     every id fetched via one key semi-join (labeled as batch
    #     key-join throughput, NOT a per-query rate).
    emb_cached = emb.cache()
    n_emb = emb_cached.count()

    def _point_lookup_loop(n_queries: int = 40):
        for qid in range(n_queries):
            emb_cached.filter(F.col("vec_id") == qid % n_emb).collect()
        return n_queries

    n_loop = timed("point_lookup_loop", _point_lookup_loop)

    def _key_join_batch():
        ids = emb_cached.select("vec_id")
        return emb_cached.join(ids, "vec_id", "left_semi").count()

    n_batch = timed("point_lookup_batch", _key_join_batch)
    detail["point_lookups"] = {
        "sequential_loop_n": n_loop,
        "sequential_lookups_per_sec": round(n_loop / timings["point_lookup_loop"], 1),
        "batch_key_join_n": n_batch,
        "batch_key_join_rows_per_sec": round(n_batch / timings["point_lookup_batch"], 1),
        "reference_lookups_per_sec": 370.45,
    }
    emb_cached.unpersist()

    # large synthetic PageRank: fixed-size power-law graph where per-
    # iteration work dominates fixed costs — the scale row the corpus
    # graph (142k edges) can't provide. SPARK_GRAFT_BENCH_BIG_EDGES=0
    # disables; graph generation is excluded from the timing.
    big_edges_target = int(os.environ.get("SPARK_GRAFT_BENCH_BIG_EDGES", "22000000"))
    if big_edges_target > 0:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from run_scaling import _make_edges

        big_nodes = max(big_edges_target // 10, 1)
        big = _make_edges(spark, big_edges_target, big_nodes).repartition(CPUS, "src").cache()
        n_big = big.count()
        big_iters = 10

        def _pr_big():
            return pagerank(
                spark, big, tol=0.0, max_iterations=big_iters,
                auto_tune=False, check_interval=5,
            )

        timed("pagerank_big", _pr_big)
        detail["pagerank_big"] = {
            "n_edges": n_big,
            "iterations": big_iters,
            "edge_iters_per_sec": round(n_big * big_iters / timings["pagerank_big"], 1),
            "cpus": CPUS,
        }

        # CSR path at the same scale — extends the documented CSR-vs-join
        # crossover data (README) with the point where per-iteration work
        # dominates; timing includes the one-time adjacency staging.
        def _pr_big_csr():
            return pagerank(
                spark, big, tol=0.0, max_iterations=big_iters,
                auto_tune=False, check_interval=5, use_csr=True,
            )

        timed("pagerank_big_csr", _pr_big_csr)
        detail["pagerank_big"]["csr_edge_iters_per_sec"] = round(
            n_big * big_iters / timings["pagerank_big_csr"], 1
        )

        # frontier-based BFS on the same graph: per-round cost must track
        # the frontier wave, not the reached set (round_seconds should
        # decay with frontier_rows in the tail)
        def _bfs_big():
            return bfs_distances(
                spark, big, sources=[0], directed=True, max_iterations=30,
            )

        res_bfs = timed("bfs_big", _bfs_big)
        detail["bfs_big"] = {
            "n_edges": n_big,
            "iterations": res_bfs.iterations,
            "reached": res_bfs.state.filter("dist IS NOT NULL").count(),
            "frontier_rows": [m.get("frontier_rows") for m in res_bfs.metrics],
            "round_seconds": [round(m["seconds"], 2) for m in res_bfs.metrics],
        }
        big.unpersist()

    pages.unpersist()
    tables.edges.unpersist()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **detail,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
