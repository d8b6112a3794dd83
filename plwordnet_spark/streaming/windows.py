"""Structured Streaming over the events table.

The reference has no streaming (SURVEY.md §2.11 — its incremental
patterns map to snapshot checkpoints, implemented in storage/). This
module adds the streaming surface a web-scale ingest pipeline needs:
file-source event streams, watermarked tumbling-window aggregation for
late data, and session windows. The same transformations run in batch
mode (Structured Streaming's unified model), which is how the tests
assert parity: batch result == streamed-to-completion result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "read_event_stream",
    "windowed_event_counts",
    "sessionize_events",
    "dedup_events",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Parquet-directory file stream with the strict events schema."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a
    watermark bounding state for late data. Works on both streaming and
    batch frames (batch ignores the watermark — used by tests for
    parity)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication on ``keys`` (default event_id) —
    the crawl-pipeline shape where at-least-once sources re-deliver
    records. On a stream, ``dropDuplicatesWithinWatermark`` bounds the
    dedup state to the watermark horizon (an unbounded dropDuplicates
    would grow state forever at web scale); on a batch frame the same
    call degrades to plain dropDuplicates, which is how the tests
    assert stream==batch parity on in-horizon data."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based), count + duration."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
