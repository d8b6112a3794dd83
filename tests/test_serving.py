"""PointIndex: build-once / serve-from-RAM point lookups (round 5).

The reference serves per-id vector gets from a Milvus index
(INSTALL.md:243-244, 370.45 lookups/s single-threaded); PointIndex is
the engine's serving-tier equivalent — one Spark projection job, then
O(1) in-memory gets with no job launch.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from plwordnet_spark.storage.serving import PointIndex


def _table(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("row"), F.col("id")).alias("name"),
    )


def test_point_index_lookup_roundtrip(spark):
    idx = PointIndex.build(_table(spark), "k")
    assert len(idx) == 500
    assert idx.build_seconds > 0
    row = idx.lookup(123)
    assert row == {"k": 123, "v": 369, "name": "row123"}
    assert idx.lookup(10_000) is None
    assert 7 in idx and 9_999 not in idx


def test_point_index_value_cols_projection(spark):
    idx = PointIndex.build(_table(spark), "k", value_cols=["v"])
    assert set(idx.lookup(4).keys()) == {"k", "v"}


def test_point_index_lookup_many_keeps_input_order(spark):
    idx = PointIndex.build(_table(spark), "k")
    out = idx.lookup_many([42, 7, 42, 99_999, 0])
    # absent key dropped; duplicates and caller order preserved
    assert list(out["k"]) == [42, 7, 42, 0]
    assert list(out["v"]) == [126, 21, 126, 0]


def test_point_index_duplicate_keys_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, tag string"
    )
    idx = PointIndex.build(df, "k")
    assert len(idx) == 2
    assert idx.lookup(1)["tag"] in {"a", "b"}  # deterministic per plan order


def test_point_index_max_rows_guard(spark):
    with pytest.raises(ValueError, match="max_rows"):
        PointIndex.build(_table(spark), "k", max_rows=10)


def test_point_index_shard_matches_bucket_hash_partition(spark):
    """shard() must partition the key space completely and disjointly,
    and agree with Spark's own pmod(hash) bucketing function."""
    df = _table(spark, 1000)
    n_shards = 8
    seen = []
    for i in range(n_shards):
        keys = [r["k"] for r in PointIndex.shard(df, "k", n_shards, i).collect()]
        seen.extend(keys)
        # every key in shard i hashes to i under Spark's own function
        got = (
            df.filter(F.col("k").isin(keys or [-1]))
            .select(F.pmod(F.hash("k"), F.lit(n_shards)).alias("b"))
            .distinct()
            .collect()
        )
        assert all(r["b"] == i for r in got)
    assert sorted(seen) == list(range(1000))


def test_point_index_sharded_builds_cover_table(spark):
    df = _table(spark, 300)
    total = 0
    for i in range(4):
        idx = PointIndex.build(PointIndex.shard(df, "k", 4, i), "k")
        total += len(idx)
    assert total == 300
