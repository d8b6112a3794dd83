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

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "bucketed_edges_tables"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
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
