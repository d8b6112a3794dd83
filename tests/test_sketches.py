"""Count-min sketch: overestimate guarantee, exactness without
collisions, mergeability, pure-python hash parity."""

from __future__ import annotations

import random
from collections import Counter

from plwordnet_spark.sketches import CMS_P, DEPTH_SEEDS, cms_build, cms_estimate


def _py_estimates(values, width, depth):
    grids = [Counter() for _ in range(depth)]
    for v in values:
        for i, (a, b) in enumerate(DEPTH_SEEDS[:depth]):
            grids[i][((v % CMS_P) * a + b) % CMS_P % width] += 1
    out = {}
    for v in set(values):
        out[v] = min(
            grids[i][((v % CMS_P) * a + b) % CMS_P % width]
            for i, (a, b) in enumerate(DEPTH_SEEDS[:depth])
        )
    return out


class TestCountMin:
    def _run(self, spark, values, width, depth):
        df = spark.createDataFrame([(v,) for v in values], "k long")
        grid = cms_build(df, "k", width=width, depth=depth)
        keys = df.distinct()
        return {
            r["k"]: r["est"]
            for r in cms_estimate(
                grid, keys, "k", width=width, depth=depth
            ).collect()
        }

    def test_matches_python_replay_and_overestimates(self, spark):
        rng = random.Random(13)
        values = [rng.randrange(50) for _ in range(400)]
        exact = Counter(values)
        got = self._run(spark, values, width=16, depth=3)
        assert got == _py_estimates(values, 16, 3)
        assert all(got[v] >= exact[v] for v in exact)
        # narrow grid on 50 keys MUST collide somewhere
        assert any(got[v] > exact[v] for v in exact)

    def test_exact_when_grid_is_wide(self, spark):
        values = list(range(20)) * 3
        got = self._run(spark, values, width=4096, depth=4)
        assert all(est == 3 for est in got.values())

    def test_grids_merge_by_sum(self, spark):
        from pyspark.sql import functions as F

        a = [1, 2, 2, 3] * 5
        b = [2, 3, 3, 4] * 5
        df_a = spark.createDataFrame([(v,) for v in a], "k long")
        df_b = spark.createDataFrame([(v,) for v in b], "k long")
        g = (
            cms_build(df_a, "k", width=64, depth=2)
            .unionByName(cms_build(df_b, "k", width=64, depth=2))
            .groupBy("row", "slot")
            .agg(F.sum("c").alias("c"))
        )
        keys = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "k long")
        got = {
            r["k"]: r["est"]
            for r in cms_estimate(g, keys, "k", width=64, depth=2).collect()
        }
        whole = self._run(spark, a + b, width=64, depth=2)
        assert got == whole

    def test_unseen_key_estimates_zero_on_wide_grid(self, spark):
        df = spark.createDataFrame([(1,)] * 10, "k long")
        grid = cms_build(df, "k", width=4096, depth=4)
        keys = spark.createDataFrame([(999,)], "k long")
        got = cms_estimate(grid, keys, "k", width=4096, depth=4).first()
        assert got["est"] == 0


class TestStreamingCms:
    def test_foreachbatch_merge_equals_batch(self, spark, sf_dir, tmp_path):
        """The mergeability contract in its streaming form: per-micro-
        batch CMS grids, summed across batches via foreachBatch, equal
        the one-shot batch grid over the same events."""
        from pyspark.sql import functions as F

        batch = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
        want = sorted(
            map(tuple, cms_build(batch, "user_id", width=32, depth=3).collect())
        )

        # stage as 4 files so the stream runs multiple micro-batches
        src_dir = tmp_path / "ev_in"
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id")
            .repartition(4)
            .write.parquet(str(src_dir))
        )
        stream = (
            spark.readStream.schema("user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        acc: dict[tuple[int, int], int] = {}
        n_batches = []

        def merge(bdf, bid):
            n_batches.append(bid)
            for r in cms_build(bdf, "user_id", width=32, depth=3).collect():
                k = (r["row"], r["slot"])
                acc[k] = acc.get(k, 0) + r["c"]

        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        assert len(n_batches) > 1  # genuinely incremental
        got = sorted((row, slot, c) for (row, slot), c in acc.items())
        assert got == want
