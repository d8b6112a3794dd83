"""Bucket-pruned point lookups at a scale where a full scan costs real
I/O — closing VERDICT r4 item 6.

At sf0.1 (50k rows) the bucketed sequential-lookup loop LOST to the
plain loop (12.9 vs 18.7 lookups/s, BENCH_r04): per-job overhead
dominates when the whole table scans in milliseconds, so bucket pruning
was plan-proven (SelectedBucketsCount 1/16) but bench-invisible. This
tool re-measures the same pair on a table big enough that scanning all
of it per lookup is the dominant cost, the regime the optimization
exists for — plus the sortBy-within-bucket variant, where parquet
row-group min/max stats prune WITHIN the selected bucket's files.

Table: ``--rows`` rows (default 24M) × ~120-byte payload (≈3 GB
parquet), written three ways:

* plain parquet, rows hash-shuffled so row-group min/max stats cannot
  prune key ranges (the honest unindexed baseline);
* bucketed by key, 16 buckets, unsorted within buckets;
* bucketed by key, 16 buckets, sortBy(key) within buckets.

Then ``--lookups`` random existing keys are fetched one job at a time
from each layout (bucketed reads under ``bucket_pruned_scans``).
Writes BENCH/runs/bucket_lookup_<cpus>.json.

Usage:
    python tools/bench_bucket_lookup.py [--rows 24000000] [--lookups 20]
        [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=24_000_000)
    ap.add_argument("--lookups", type=int, default=20)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from plwordnet_spark.session import get_spark
    from plwordnet_spark.storage.bucketed import (
        bucket_pruned_scans,
        drop_table,
        write_bucketed,
    )

    spark = get_spark(app_name="plwordnet-spark-bucketlu", master=f"local[{args.cpus}]")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="plwn_bucket_lu_")
    plain_path = os.path.join(tmp, "plain")

    base = spark.range(args.rows).select(
        F.col("id").alias("key"),
        # ~120-byte payload so a full scan moves real bytes
        F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string")),
                 F.lit("-"), F.md5((F.col("id") * 7).cast("string")),
                 F.lit("-"), F.md5((F.col("id") * 13).cast("string"))).alias("payload"),
    )
    # hash-shuffle so plain parquet row-group stats cannot prune key ranges
    base.repartition(args.cpus * 2, F.col("payload")).write.mode("overwrite").parquet(plain_path)
    for t in ("lu_bucketed", "lu_bucketed_sorted"):
        drop_table(spark, t)
    src = spark.read.parquet(plain_path)
    write_bucketed(src, "lu_bucketed", ["key"], args.buckets)
    write_bucketed(src, "lu_bucketed_sorted", ["key"], args.buckets, sort_cols=["key"])

    rng = random.Random(42)
    keys = [rng.randrange(args.rows) for _ in range(args.lookups)]

    plain_df = spark.read.parquet(plain_path)

    def loop_plain() -> float:
        t0 = time.time()
        for k in keys:
            plain_df.filter(F.col("key") == k).collect()
        return time.time() - t0

    def loop_table(name: str) -> float:
        df = spark.table(name)
        t0 = time.time()
        with bucket_pruned_scans(spark):
            for k in keys:
                df.filter(F.col("key") == k).collect()
        return time.time() - t0

    # warm the file-system cache identically: one full scan each
    plain_df.count()
    spark.table("lu_bucketed").count()
    spark.table("lu_bucketed_sorted").count()

    plain_sec = loop_plain()
    bucketed_sec = loop_table("lu_bucketed")
    sorted_sec = loop_table("lu_bucketed_sorted")

    def du(path: str) -> int:
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path) for f in fs
        )

    def n_files(table: str) -> int:
        wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
        loc = os.path.join(wh, table)
        return sum(
            1 for dp, _, fs in os.walk(loc) for f in fs if f.endswith(".parquet")
        )

    out = {
        "kind": "bucket_lookup",
        "cpus": args.cpus,
        "rows": args.rows,
        "n_buckets": args.buckets,
        "lookups": args.lookups,
        "table_bytes": du(plain_path),
        "bucketed_files": n_files("lu_bucketed"),
        "bucketed_sorted_files": n_files("lu_bucketed_sorted"),
        "plain_seconds": round(plain_sec, 2),
        "plain_lookups_per_sec": round(args.lookups / plain_sec, 2),
        "bucketed_seconds": round(bucketed_sec, 2),
        "bucketed_lookups_per_sec": round(args.lookups / bucketed_sec, 2),
        "bucketed_sorted_seconds": round(sorted_sec, 2),
        "bucketed_sorted_lookups_per_sec": round(args.lookups / sorted_sec, 2),
        "bucketed_speedup_vs_plain": round(plain_sec / bucketed_sec, 2),
        "sorted_speedup_vs_plain": round(plain_sec / sorted_sec, 2),
    }
    os.makedirs(os.path.join(REPO, "BENCH", "runs"), exist_ok=True)
    with open(
        os.path.join(REPO, "BENCH", "runs", f"bucket_lookup_{args.cpus}.json"),
        "w", encoding="utf-8",
    ) as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    for t in ("lu_bucketed", "lu_bucketed_sorted"):
        drop_table(spark, t)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
