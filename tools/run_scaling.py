"""Scaling-efficiency evidence: the same PageRank job at two parallelism
levels (local[8] vs local[32] — the sandbox proxy for N vs 4N executors
per the task brief), identical input, throughput at both + efficiency.

Writes BENCH/BASELINE.md. Usage:
    python tools/run_scaling.py [n_pages] [low_cpus] [high_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from plwordnet_spark.session import get_spark
from plwordnet_spark.corpus import generate_pages
from plwordnet_spark.graph.build import build_graph
from plwordnet_spark.graph.pagerank import pagerank

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]")
pages = generate_pages(spark, n_pages, 42).cache(); pages.count()
tables = build_graph(pages)
edges = tables.edges.cache(); n_edges = edges.count()
# warm-up iteration excluded: JIT + cache effects hit the first job
pagerank(spark, edges, nodes=tables.nodes, tol=1e30, max_iterations=1)
start = time.time()
res = pagerank(spark, edges, nodes=tables.nodes, tol=1e-6, max_iterations=60)
sec = time.time() - start
print("RESULT " + json.dumps({{
    "cpus": cpus, "n_pages": n_pages, "n_edges": n_edges,
    "iterations": res.iterations, "converged": res.converged,
    "seconds": round(sec, 3),
    "edge_iters_per_sec": round(n_edges * res.iterations / sec, 1),
}}))
spark.stop()
"""


def run_one(cpus: int, n_pages: int) -> dict:
    script = _RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_pages)],
        capture_output=True, text=True, timeout=1800, check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line:\n{out.stdout}\n{out.stderr}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    results = [run_one(low, n_pages), run_one(high, n_pages)]
    r_low, r_high = results
    speedup = r_low["seconds"] / r_high["seconds"]
    efficiency = speedup / (high / low)
    report = {
        "runs": results,
        "speedup": round(speedup, 3),
        "core_ratio": high / low,
        "scaling_efficiency": round(efficiency, 3),
        "generated_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w", encoding="utf-8") as fh:
        fh.write(
            "# BENCH baseline — scaling evidence\n\n"
            "North-rule criterion: ≥0.8 throughput scaling efficiency between\n"
            "N and 4N executors. Sandbox proxy (per task brief): the same\n"
            f"PageRank-to-convergence job on the identical {n_pages}-page\n"
            f"synthetic link graph at local[{low}] and local[{high}].\n\n"
            "| cpus | edges | iterations | seconds | edge·iters/sec |\n"
            "|---|---|---|---|---|\n"
        )
        for r in results:
            fh.write(
                f"| {r['cpus']} | {r['n_edges']} | {r['iterations']} | "
                f"{r['seconds']} | {r['edge_iters_per_sec']} |\n"
            )
        fh.write(
            f"\nSpeedup {low}→{high} cores: **{report['speedup']}×** over a "
            f"{report['core_ratio']:.0f}× core ratio → scaling efficiency "
            f"**{report['scaling_efficiency']}**.\n\n"
            "Caveats: local mode shares one JVM and disk; per-iteration\n"
            "fixed costs (planning, task launch) do not shrink with cores,\n"
            "so efficiency here understates multi-executor scaling where\n"
            "per-iteration work dominates. Raw JSON below.\n\n```json\n"
            + json.dumps(report, indent=1)
            + "\n```\n"
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
