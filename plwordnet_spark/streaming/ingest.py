"""Streaming crawl ingestion: page stream → incremental edge table.

Ties the engine's pieces into the production ingest shape: a Structured
Streaming source of pages feeds the extraction UDFs, and each
micro-batch's links are merged into the persistent edge table with
additive MERGE semantics (graph.build.merge_edge_tables) inside
``foreachBatch``; every merge commits a snapshot (storage.snapshots)
carrying batch metrics — so the graph is queryable, resumable, and
audit-able while the crawl is still running.

At production scale the same topology reads WARC drops from object
storage (file source with maxFilesPerTrigger as backpressure) and the
sink is an Iceberg MERGE INTO; here the snapshot store stands in
(SURVEY.md §7 Iceberg fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plwordnet_spark.corpus import PAGES_SCHEMA
from plwordnet_spark.extraction.udfs import extract_links_udf
from plwordnet_spark.graph.build import merge_edge_tables
from plwordnet_spark.storage.snapshots import SnapshotStore

__all__ = ["read_page_stream", "stream_pages_to_edges"]

REL_INTRA_DOMAIN = 1
REL_CROSS_DOMAIN = 2


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """Parquet-directory stream of pages rows (strict schema)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _batch_edges(pages: DataFrame) -> DataFrame:
    """One micro-batch of pages → (src, dst, rel_id, weight) edges.
    Same derivation as graph.build.build_graph's link_pairs stage."""
    dom = lambda c: F.lower(  # noqa: E731
        F.split_part(F.split_part(c, F.lit("//"), F.lit(2)), F.lit("/"), F.lit(1))
    )
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links_udf(F.col("html"))).alias("dst_url"),
        )
        .withColumn(
            "rel_id",
            F.when(dom(F.col("src_url")) == dom(F.col("dst_url")), F.lit(REL_INTRA_DOMAIN))
            .otherwise(F.lit(REL_CROSS_DOMAIN)),
        )
        .select(
            F.xxhash64("src_url").alias("src"),
            F.xxhash64("dst_url").alias("dst"),
            "rel_id",
        )
        .groupBy("src", "dst", "rel_id")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def stream_pages_to_edges(
    spark: SparkSession,
    pages_stream: DataFrame,
    edges_dir: str,
    checkpoint_dir: str,
):
    """Start the ingest query. Returns the StreamingQuery; the caller
    owns its lifecycle. The latest merged edge table is always
    ``SnapshotStore(spark, edges_dir).latest()``."""
    store = SnapshotStore(spark, edges_dir)

    def _merge(batch_pages: DataFrame, batch_id: int) -> None:
        # idempotency guard: foreachBatch is at-least-once — if the job
        # died after the snapshot committed but before the streaming
        # checkpoint did, the replayed micro-batch must NOT be merged
        # again (additive weights would double-count). A batch is
        # identified by (batch_id, content fingerprint), not batch_id
        # order alone: a restart with a FRESH checkpoint re-numbers
        # batches from 0, and new data arriving under an old batch_id
        # must still merge (the reference's resumable skip-already-done
        # pattern, wrappers.py:292-304, made content-aware).
        # fingerprint covers url AND html bytes: a recrawl that reuses an
        # old batch_id with the same URL multiset but changed page content
        # (updated links) must NOT be skipped — only byte-identical
        # replays are.
        row = batch_pages.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("url", "html").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        n_pages, content_hash = int(row["n"]), str(row["h"])
        for entry in store.manifest():
            m = entry.get("metrics", {})
            if m.get("batch_id") == int(batch_id) and m.get("content_hash") == content_hash:
                return  # exact replay of an already-merged batch
        new_edges = _batch_edges(batch_pages)
        latest = store.latest()
        if latest is None:
            merged = new_edges.select("src", "dst", "rel_id", "weight")
        else:
            existing, _entry = latest
            merged = merge_edge_tables(existing, new_edges)
        store.write(
            merged,
            iteration=int(batch_id),
            metrics={
                "batch_id": int(batch_id),
                "pages_in_batch": n_pages,
                "content_hash": content_hash,
            },
        )

    return (
        pages_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
