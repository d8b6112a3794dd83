"""Landmark-flood evidence: K floods in ONE composite-key loop vs K
sequential bfs_distances runs.

landmark_distances shares every edge scan and every shuffle across the
K BFS floods (state = sparse (id, landmark, dist) pairs); the naive
alternative pays K full frontier loops — K× the fixed per-round job
cost and K edge-table scans per wave. This tool measures both on the
same synthetic graph and writes BENCH/runs/landmarks_<cpus>.json.

Usage:
    python tools/bench_landmarks.py [--edges 2000000] [--k 8] [--cpus 32]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from plwordnet_spark.graph.bfs import bfs_distances, landmark_distances
    from plwordnet_spark.session import get_spark

    spark = get_spark(app_name="plwordnet-spark-landmarks", master=f"local[{args.cpus}]")
    n_nodes = max(args.edges // 10, 1)
    edges = _make_edges(spark, args.edges, n_nodes).repartition(args.cpus, "src").cache()
    n_edges = edges.count()
    # spread landmarks across the id space deterministically
    landmarks = [int(i * n_nodes / args.k) for i in range(args.k)]

    t0 = time.time()
    composite = landmark_distances(spark, edges, landmarks=landmarks, directed=True)
    n_pairs = composite.state.count()
    composite_sec = time.time() - t0

    t0 = time.time()
    seq_pairs = 0
    for lm in landmarks:
        res = bfs_distances(spark, edges, sources=[lm], directed=True)
        seq_pairs += res.state.filter("dist IS NOT NULL").count()
    sequential_sec = time.time() - t0

    out = {
        "kind": "landmarks",
        "cpus": args.cpus,
        "n_edges": n_edges,
        "k": args.k,
        "composite_seconds": round(composite_sec, 2),
        "composite_rounds": composite.iterations,
        "reached_pairs": n_pairs,
        "sequential_seconds": round(sequential_sec, 2),
        "sequential_reached_pairs": seq_pairs,
        "speedup": round(sequential_sec / composite_sec, 2),
    }
    assert n_pairs == seq_pairs, (n_pairs, seq_pairs)
    os.makedirs(os.path.join(REPO, "BENCH", "runs"), exist_ok=True)
    with open(
        os.path.join(REPO, "BENCH", "runs", f"landmarks_{args.cpus}.json"),
        "w", encoding="utf-8",
    ) as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
