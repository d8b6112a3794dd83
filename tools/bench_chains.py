"""Pointer doubling vs per-hop walking for redirect-chain resolution.

The claim behind graph/chains.py: resolving a length-L redirect chain
costs O(log L) self-join rounds with pointer doubling vs O(L) rounds
for the naive per-hop walk — at web scale (chains from tracking hops,
country redirects, http→https ladders) the round count IS the job
count, and each round is a full shuffle. This tool measures both on the
same synthetic functional graph (disjoint chains of exact length L over
N nodes), interleaved reps, medians → BENCH/CHAINS.md.

Usage: python tools/bench_chains.py [n_nodes] [chain_len] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from plwordnet_spark.graph.chains import resolve_chains  # noqa: E402
from plwordnet_spark.session import get_spark  # noqa: E402


def make_chains(spark, n_nodes: int, chain_len: int) -> DataFrame:
    """Disjoint chains: node i redirects to i+1 unless it closes a
    chain boundary (i % chain_len == chain_len-1 → terminal)."""
    return (
        spark.range(n_nodes)
        .filter((F.col("id") % chain_len) != chain_len - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )


def naive_resolve(spark, redirects: DataFrame, max_rounds: int) -> tuple[int, int]:
    """Per-hop walk: each round advances every unresolved pointer ONE
    step (the obvious implementation). Returns (rounds, resolved)."""
    red = redirects.cache()
    red.count()
    state = red.select("src", F.col("dst").alias("ptr"))
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        nxt = (
            state.alias("s")
            .join(
                red.select(F.col("src").alias("ptr"), F.col("dst").alias("nxt")),
                "ptr",
                "left",
            )
            .select(
                F.col("s.src").alias("src"),
                F.coalesce("nxt", "ptr").alias("ptr"),
                F.col("nxt").isNotNull().alias("moved"),
            )
        ).localCheckpoint(eager=True)
        moved = nxt.filter("moved").count()
        state = nxt.drop("moved")
        if moved == 0:
            break
    resolved = state.count()
    red.unpersist()
    return rounds, resolved


def main() -> int:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench-chains", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    red = make_chains(spark, n_nodes, chain_len).cache()
    n_red = red.count()

    doubling_s, doubling_rounds, naive_s, naive_rounds = [], 0, [], 0
    for _ in range(reps):
        t0 = time.time()
        res = resolve_chains(spark, red)
        n_ok = res.state.filter(~F.col("is_cycle")).count()
        doubling_s.append(round(time.time() - t0, 3))
        doubling_rounds = res.iterations
        assert n_ok == n_red, (n_ok, n_red)

        t0 = time.time()
        naive_rounds, resolved = naive_resolve(spark, red, max_rounds=chain_len + 2)
        naive_s.append(round(time.time() - t0, 3))
        assert resolved == n_red

    med = lambda xs: statistics.median_low(xs)  # noqa: E731
    out = {
        "n_redirects": n_red,
        "chain_len": chain_len,
        "doubling_rounds": doubling_rounds,
        "doubling_sec_reps": doubling_s,
        "doubling_sec": med(doubling_s),
        "naive_rounds": naive_rounds,
        "naive_sec_reps": naive_s,
        "naive_sec": med(naive_s),
        "speedup": round(med(naive_s) / med(doubling_s), 2),
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    os.makedirs("BENCH/runs", exist_ok=True)
    with open(f"BENCH/runs/chains_{chain_len}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
