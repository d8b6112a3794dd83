"""Corpus-cleaning throughput at two parallelism levels.

The LLM-pipeline operators (C4 line dedup, n-gram decontamination,
stratified sampling) are filters over the 100 TB side of the pipeline —
their cost model is docs/sec, and the north rule's two-cluster-size
criterion applies to them exactly as to PageRank. This tool synthesizes
N documents JVM-side (no Python in the data path), runs each operator
at local[LO] and local[HI] on the SAME input, and reports throughput at
both plus strong-scaling efficiency (T_lo / T_hi / (HI/LO)) —
interleaved reps, lower-middle medians, raw arrays shipped, the same
conventions as bench.py and BENCH/BASELINE.md (whose measured machine
ceiling applies here too: a shared-host VM tops out well under the
core-count ratio).

Synthetic shape: ~8 lines x 5 tokens per doc from a 50k-token vocab
(random lines are corpus-unique), with ~20% of line slots drawn from a
4-line boilerplate pool — so line_dedup(min_count=1000) must remove
exactly the boilerplate, and the global histogram carries ~N*8*0.8
distinct rare lines (the worst case for the partial agg). The
contamination benchmark set is every 1000th doc.

Usage: python tools/bench_corpus.py [n_docs] [reps] [lo_cpus] [hi_cpus]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from plwordnet_spark.session import get_spark  # noqa: E402
from plwordnet_spark.textops.contamination import ngram_contamination  # noqa: E402
from plwordnet_spark.textops.lines import line_dedup  # noqa: E402
from plwordnet_spark.textops.sampling import stratified_sample  # noqa: E402

BOILER = [
    "accept all cookies to continue",
    "subscribe to our newsletter today",
    "all rights reserved site map",
    "click here for the mobile version",
]
N_LINES, TOKENS_PER_LINE, VOCAB = 8, 5, 50_000


def make_docs(spark, n_docs: int) -> DataFrame:
    """N synthetic docs, built entirely from JVM expressions."""
    boiler_arr = F.array(*[F.lit(b) for b in BOILER])
    rand_line = (
        lambda l: F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(TOKENS_PER_LINE - 1)),
                lambda t: F.concat(
                    F.lit("w"),
                    (
                        F.abs(F.xxhash64(F.col("id"), l, t, F.lit("tok")))
                        % VOCAB
                    ).cast("string"),
                ),
            ),
            " ",
        )
    )
    line = lambda l: F.when(  # noqa: E731
        F.abs(F.xxhash64(F.col("id"), l, F.lit("kind"))) % 5 == 0,
        F.element_at(
            boiler_arr,
            (F.abs(F.xxhash64(F.col("id"), l, F.lit("which"))) % 4 + 1).cast("int"),
        ),
    ).otherwise(rand_line(l))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.array(*[line(F.lit(l)) for l in range(N_LINES)]), "\n").alias(
            "text"
        ),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
    )


def run_level(cpus: int, n_docs: int, reps: int) -> dict:
    spark = get_spark(app_name=f"bench-corpus-{cpus}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_docs(spark, n_docs).cache()
    docs.count()
    bench = docs.filter(F.col("doc_id") % 1000 == 0)
    flat = docs.select("doc_id", F.regexp_replace("text", "\n", " ").alias("text"))

    times: dict[str, list[float]] = {"line_dedup": [], "contamination": [], "sample": []}
    survivors = contaminated = sampled = 0
    for _ in range(reps):  # interleaved: one pass over all ops per rep
        t0 = time.time()
        survivors = line_dedup(docs, min_count=1000).count()
        times["line_dedup"].append(round(time.time() - t0, 3))

        t0 = time.time()
        contaminated = (
            ngram_contamination(flat, flat.filter(F.col("doc_id") % 1000 == 0), n=3)
            .filter(F.col("contamination") > 0.5)
            .count()
        )
        times["contamination"].append(round(time.time() - t0, 3))

        t0 = time.time()
        sampled = stratified_sample(
            docs, {"en": 0.1, "de": 0.5, "fr": 0.9}, default_rate=0.3
        ).count()
        times["sample"].append(round(time.time() - t0, 3))

    # sanity: boilerplate removal keeps (almost) every doc — only the
    # ~(1/5)^8 all-boilerplate docs drop — benchmark docs
    # self-contaminate, and the sample is materially sub-total
    assert n_docs >= survivors > n_docs * 0.999, (survivors, n_docs)
    assert contaminated >= n_docs // 1000, contaminated
    assert 0 < sampled < n_docs, sampled
    spark.stop()
    med = statistics.median_low
    return {
        op: {
            "sec_reps": ts,
            "sec": med(ts),
            "docs_per_sec": round(n_docs / med(ts)),
        }
        for op, ts in times.items()
    } | {"counts": {"survivors": survivors, "contaminated": contaminated, "sampled": sampled}}


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    res_lo, res_hi = run_level(lo, n_docs, reps), run_level(hi, n_docs, reps)
    out = {"n_docs": n_docs, "reps": reps, "lo_cpus": lo, "hi_cpus": hi,
           f"local[{lo}]": res_lo, f"local[{hi}]": res_hi, "efficiency": {}}
    for op in ("line_dedup", "contamination", "sample"):
        t_lo, t_hi = res_lo[op]["sec"], res_hi[op]["sec"]
        out["efficiency"][op] = round(t_lo / t_hi / (hi / lo), 3)
    print(json.dumps(out))
    os.makedirs("BENCH/runs", exist_ok=True)
    with open("BENCH/runs/corpus.json", "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
