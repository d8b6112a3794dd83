"""Stream-stream interval join: watermarked event attribution.

The missing piece between windowed aggregation and stateful processing
in the streaming surface: joining two live streams on a key AND a time
window — the canonical click-attribution shape (every click matched to
the impressions it followed within the attribution window). Structured
Streaming supports this as a watermarked stream-stream inner join: the
watermarks plus the two-sided time-range predicate bound each side's
join state (Spark evicts buffered rows once the other side's watermark
passes the range), so state stays O(window · rate) instead of growing
with the stream.

The same expression runs in batch (unified model): the equi-key +
range condition plans as a hash join on the key with the range as a
post-filter — never a nested loop — which is how the tests assert
stream == batch parity and how the driver's SQL oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attributed_clicks", "interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows of ``right`` matched to ``left`` rows with the same ``key``
    and ``left_ts <= right_ts < left_ts + window`` (inner join).

    On streaming inputs both sides are watermarked (required for
    state eviction in a stream-stream join); batch inputs pass through
    unchanged. Column names must already be disjoint apart from
    ``key`` — alias upstream (``attributed_clicks`` shows the shape).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    # rename the right key: both sides often derive from the SAME parent
    # (one-firehose self-join), where left[key] == right[key] relies on
    # Spark's dataset-id disambiguation — an explicit rename removes the
    # ambiguity instead of warning past it
    rkey = f"__{key}_r"
    right = right.withColumnRenamed(key, rkey)
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(left_ts) <= F.col(right_ts))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {window}"))
    )
    return left.join(right, cond, "inner").drop(rkey)


def attributed_clicks(
    events: DataFrame,
    window: str = "30 minutes",
    watermark: str = "2 hours",
    impression_type: str = "view",
    click_type: str = "click",
) -> DataFrame:
    """events(event_id, ts, user_id, event_type, …) → one row per
    (impression, click) pair where the SAME user clicked within
    ``window`` after the impression.

    Output: (user_id, imp_id, imp_ts, click_id, click_ts). A click may
    attribute to several impressions (position ranking is the caller's
    policy — last-touch = max imp_ts per click_id); an impression may
    earn several clicks. Works on one stream self-joined (the common
    single-firehose deployment) or on a batch frame for backfill."""
    imps = events.filter(F.col("event_type") == impression_type).select(
        "user_id",
        F.col("event_id").alias("imp_id"),
        F.col("ts").alias("imp_ts"),
    )
    clicks = events.filter(F.col("event_type") == click_type).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return interval_join(
        imps, clicks, "user_id", "imp_ts", "click_ts", window, watermark
    ).select("user_id", "imp_id", "imp_ts", "click_id", "click_ts")
