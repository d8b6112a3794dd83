"""Bucketed-table persistence for co-located, exchange-free joins.

At 100 TB the dominant recurring cost of graph jobs is re-shuffling the
edge table for every join on ``src``. Writing it ONCE bucketed by the
join key (hash bucketing, Spark ``bucketBy`` + ``saveAsTable``) lets
every later equi-join/aggregation on that key skip its Exchange: the
scan's output partitioning already satisfies the requirement.

This is the persistent-storage complement to the in-memory
``repartition("src").cache()`` the PageRank loop uses — caches die with
the session, bucket layout survives in the table metadata. The audit in
tools/explain_audit.py (and test_bucketed_join_no_exchange) proves the
Exchange disappears.

Requires a session catalog (in-memory catalog is fine; no Hive needed)
and a ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed",
    "read_table",
    "bucketed_edges_tables",
    "bucket_pruned_scans",
    "drop_table",
]


def drop_table(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS *plus* clearing a stale managed location.

    A run killed between ``saveAsTable`` and its DROP leaves the
    warehouse directory behind with no catalog entry; the next
    ``saveAsTable`` then refuses with LOCATION_ALREADY_EXISTS. Call this
    before every ``write_bucketed`` of a managed table name that a
    previous (possibly crashed) run may have used.

    When the table still EXISTS in the catalog, its real location is
    resolved from the catalog before dropping, so qualified names
    (``db.tbl``) and non-default current databases are handled. The
    crashed-run fallback (no catalog entry, so nothing to resolve)
    applies only to UNQUALIFIED names and targets
    ``<warehouse>/<name><suffix>``, where the suffix covers default-
    database layouts across Spark versions ('' and '.db' parents are
    NOT guessed — a qualified name whose catalog entry is already gone
    must be cleaned up by the caller, rather than this function rmtree'ing
    a guessed path that may belong to something else (ADVICE r4)."""
    import os
    import shutil

    location = None
    if spark.catalog.tableExists(table):
        try:
            detail = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            for row in detail:
                if row["col_name"] == "Location":
                    location = row["data_type"]
                    break
        except Exception:
            location = None  # raced away / view: fall through
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location:
        if location.startswith("file:"):
            location = location[len("file:"):]
        shutil.rmtree(location, ignore_errors=True)
        return
    if "." in table:
        return  # qualified name with no catalog entry: no safe guess
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if warehouse:
        shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)


@contextmanager
def bucket_pruned_scans(spark: SparkSession):
    """Keep bucketed reading ON for filter-only queries.

    Spark's DisableUnnecessaryBucketedScan rule turns bucketed reading
    off when no downstream operator needs the hash distribution — which
    also forfeits bucket PRUNING for plain key-equality lookups. Inside
    this context a ``key = x`` filter on a bucketed-by-key table scans
    one bucket's files (plan: ``SelectedBucketsCount: 1 out of N``) —
    at 100 TB, 1/N of the table per lookup instead of all of it, the
    storage-side analog of an index probe. The conf is read at planning
    time, so run the lookup's action inside the context."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    align_partitions: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``align_partitions`` (default on) repartitions by the bucket columns
    into exactly ``n_buckets`` partitions before writing. Spark's
    ``repartition(n, cols)`` hash (pmod of Murmur3) is the SAME function
    the bucketed writer uses to assign bucket ids, so each writer task
    holds exactly one bucket's rows → **one file per bucket** instead of
    (writer-partitions × buckets) shards. This matters twice at scale:
    a bucket-pruned point lookup runs as ONE task reading that bucket's
    files, so per-lookup latency is the serial read of table/N_buckets
    bytes plus per-file overhead — round 5 measured the unaligned layout
    (64 writers × 16 buckets ≈ 10³ shards) LOSING to a parallel full
    scan at 2.5 GB, and the aligned layout winning (BENCH/runs/
    bucket_lookup*.json); and shuffle-free bucketed joins open one
    stream per bucket file on both sides. Turn off only when a single
    bucket's data exceeds a comfortable write-task size."""
    if align_partitions:
        df = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_edges_tables(
    spark: SparkSession,
    edges: DataFrame,
    prefix: str = "linkgraph",
    n_buckets: int = 32,
) -> tuple[str, str]:
    """Persist the edge table twice — bucketed by src (scatter joins) and
    by dst (gather-side joins) — and return the two table names.

    Double-writing trades 2× storage for zero exchanges on either join
    direction; at web scale the shuffle saved per PageRank run dwarfs
    the one-time write (the classic bucketed-layout tradeoff).
    """
    src_table = f"{prefix}_edges_by_src"
    dst_table = f"{prefix}_edges_by_dst"
    write_bucketed(edges, src_table, ["src"], n_buckets, sort_cols=["src"])
    write_bucketed(edges, dst_table, ["dst"], n_buckets, sort_cols=["dst"])
    return src_table, dst_table
