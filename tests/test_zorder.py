"""Z-order layout: Morton-code correctness vs pure Python, and the
row-group-skipping advantage over a single-key sort, measured from
parquet footer stats (deterministic, no timing)."""

from __future__ import annotations

from plwordnet_spark.storage.zorder import (
    rowgroup_skip_stats,
    write_zordered,
    z_value_expr,
)


def _py_z(vals, bits):
    z = 0
    k = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * k + j)
    return z


class TestZValue:
    def test_matches_python_2d(self, spark):
        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y", z_value_expr(["x", "y"], bits=4).alias("z")
            ).collect()
        }
        assert got == {(x, y): _py_z((x, y), 4) for x, y in rows}
        # bijective on the grid
        assert len(set(got.values())) == len(rows)

    def test_matches_python_3d(self, spark):
        rows = [(x, y, w) for x in range(8) for y in range(8) for w in range(8)]
        df = spark.createDataFrame(rows, "x long, y long, w long")
        got = {
            (r["x"], r["y"], r["w"]): r["z"]
            for r in df.select(
                "x", "y", "w", z_value_expr(["x", "y", "w"], bits=3).alias("z")
            ).collect()
        }
        assert got == {t: _py_z(t, 3) for t in rows}

    def test_bit_budget_enforced(self, spark):
        import pytest

        with pytest.raises(ValueError):
            z_value_expr(["a", "b"], bits=32)


class TestZorderedLayout:
    def test_box_query_skips_more_than_linear_sort(self, spark, tmp_path):
        # 256x256 grid; box = 16x16 corner. Linear sort on x packs full
        # y-slabs per row group (box spans few x-groups but ALL of them
        # fully); z-order packs squares, so footer stats skip most
        # groups. Assert z-order must-read strictly less.
        rows = [(x, y) for x in range(256) for y in range(256)]
        df = spark.createDataFrame(rows, "x long, y long").coalesce(1)

        zpath = str(tmp_path / "zord")
        write_zordered(df, zpath, ["x", "y"], bits=8, n_files=64)
        lpath = str(tmp_path / "linear")
        (
            df.repartitionByRange(64, "x")
            .sortWithinPartitions("x", "y")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        box = {"x": (0, 15), "y": (0, 15)}
        zs = rowgroup_skip_stats(zpath, box)
        ls = rowgroup_skip_stats(lpath, box)
        assert zs["row_groups"] > 1
        assert zs["must_read"] < ls["must_read"]
        # the box is 1/256 of the data; z-order should read a small slice
        assert zs["must_read"] <= max(1, zs["row_groups"] // 4)

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        rows = [(x, (x * 7) % 64) for x in range(64)]
        df = spark.createDataFrame(rows, "x long, y long")
        p = str(tmp_path / "rt")
        write_zordered(df, p, ["x", "y"], bits=6, n_files=2)
        back = spark.read.parquet(p)
        assert sorted((r["x"], r["y"]) for r in back.collect()) == sorted(rows)
        assert back.columns == ["x", "y"]
