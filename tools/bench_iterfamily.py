"""Scale check for the round-5 iterative operators that share
PageRank's per-round shape: temporal reachability, hashed-WL labels,
seeded watershed spreading, and synchronous Louvain (move phase).

Each claims "one frontier/adjacency join + one partial-agg gather per
round" in its docstring; this tool measures all four on the same
synthetic power-law graph and reports per-round edge throughput next to
a plain fixed-iteration PageRank run on the identical input — if the
claims hold, the numbers land in the same decade. Writes
BENCH/runs/iterfamily_<cpus>.json.

Usage:
    python tools/bench_iterfamily.py [--edges 2000000] [--cpus 32] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from run_scaling import _make_edges  # noqa: E402


def _median(xs):
    xs = sorted(xs)
    return xs[(len(xs) - 1) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from plwordnet_spark.graph.louvain import louvain_move_phase
    from plwordnet_spark.graph.pagerank import pagerank
    from plwordnet_spark.graph.seedprop import seed_label_spread
    from plwordnet_spark.graph.temporal import temporal_reachability
    from plwordnet_spark.graph.wl import wl_labels
    from plwordnet_spark.session import get_spark

    spark = get_spark(
        app_name="plwordnet-spark-iterfamily", master=f"local[{args.cpus}]"
    )
    n_nodes = max(args.edges // 10, 1)
    edges = _make_edges(spark, args.edges, n_nodes).repartition(
        args.cpus, "src"
    ).cache()
    n_edges = edges.count()
    # deterministic per-edge timestamps for the temporal run
    tedges = edges.select(
        "src", "dst", (F.pmod(F.col("src") * 7 + F.col("dst") * 13, F.lit(1000))).alias("t")
    )
    seeds = spark.createDataFrame(
        [(int(i * n_nodes / 4), i) for i in range(4)], "id long, label long"
    )

    rounds = 5
    tasks = {
        "pagerank_5it": lambda: pagerank(
            spark, edges, max_iterations=rounds, tol=0.0
        ).state.count(),
        "temporal_reach": lambda: temporal_reachability(
            spark, tedges, [0], start_time=0, max_iterations=30
        ).state.count(),
        "wl_labels_5it": lambda: wl_labels(
            spark, edges, iterations=rounds, directed=True
        ).count(),
        "seed_spread_5r": lambda: seed_label_spread(
            spark, edges, seeds, rounds=rounds, directed=True
        ).count(),
        "louvain_5r": lambda: louvain_move_phase(
            spark, edges, rounds=rounds
        ).count(),
    }
    times: dict[str, list[float]] = {k: [] for k in tasks}
    rows: dict[str, int] = {}
    for rep in range(args.reps):
        for name, fn in tasks.items():
            t0 = time.time()
            rows[name] = fn()
            times[name].append(round(time.time() - t0, 2))

    out = {
        "kind": "iterfamily",
        "cpus": args.cpus,
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "rounds": rounds,
        "median_sec": {k: _median(v) for k, v in times.items()},
        "reps_sec": times,
        "rows": rows,
        "edge_rounds_per_sec": {
            k: round(n_edges * rounds / _median(v), 1)
            for k, v in times.items()
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH", "runs"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "runs", f"iterfamily_{args.cpus}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
