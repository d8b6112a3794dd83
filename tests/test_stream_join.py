"""Stream-stream watermarked interval join (streaming/joins.py)."""

from __future__ import annotations

import datetime as dt
import shutil

from plwordnet_spark.streaming.joins import attributed_clicks, interval_join
from plwordnet_spark.streaming.windows import read_event_stream


def test_interval_join_batch_semantics(spark):
    t0 = dt.datetime(2025, 1, 1, 12, 0)
    imps = spark.createDataFrame(
        [(1, 100, t0), (1, 101, t0 + dt.timedelta(minutes=40)), (2, 102, t0)],
        "user_id long, imp_id long, imp_ts timestamp",
    )
    clicks = spark.createDataFrame(
        [
            (1, 900, t0 + dt.timedelta(minutes=10)),   # → imp 100
            (1, 901, t0 + dt.timedelta(minutes=45)),   # → imp 101 only (100 window passed)
            (2, 902, t0 + dt.timedelta(minutes=29)),   # → imp 102 (inside)
            (2, 903, t0 + dt.timedelta(minutes=30)),   # boundary: exclusive → no match
            (1, 904, t0 - dt.timedelta(minutes=1)),    # click before impression → none
        ],
        "user_id long, click_id long, click_ts timestamp",
    )
    got = sorted(
        (r["imp_id"], r["click_id"])
        for r in interval_join(
            imps, clicks, "user_id", "imp_ts", "click_ts", window="30 minutes"
        ).collect()
    )
    assert got == [(100, 900), (101, 901), (102, 902)]


def test_attributed_clicks_stream_equals_batch(spark, sf_dir, tmp_path):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = sorted(map(tuple, attributed_clicks(batch).collect()))
    assert expected, "fixture must produce at least one attributed pair"

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0000.parquet")
    stream = read_event_stream(spark, str(src_dir), max_files_per_trigger=1)
    out = attributed_clicks(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.processAllAvailable()
    got = sorted(map(tuple, spark.sql("SELECT * FROM attributed").collect()))
    query.stop()
    assert got == expected
