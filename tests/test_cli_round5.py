"""CLI reach for the round-5 marquee ops: spam-mass, resolve-chains.

Reuses the shared test session via the same autouse monkeypatch as
test_cli.py — without it, cli.main's ``spark.stop()`` kills the
session-scoped fixture's JVM context (getOrCreate returns the SAME
underlying SparkContext in one process) and every later test file
dies with a stopped-context AttributeError."""

from __future__ import annotations

import glob
import json

import pyarrow.parquet as pq
import pytest

from plwordnet_spark import cli


@pytest.fixture(autouse=True)
def _reuse_test_session(spark, monkeypatch):
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)


def test_cli_spam_mass_and_resolve_chains(spark, tmp_path, capsys):
    # fixture-session work first: stage the redirect table
    red = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 12), (12, 10)],
        "src long, dst long",
    )
    red_path = str(tmp_path / "red")
    red.write.parquet(red_path)

    graph_dir = str(tmp_path / "g")
    assert cli.main(["build-graph", "--n-pages", "200", "--output", graph_dir]) == 0
    capsys.readouterr()

    node_file = sorted(glob.glob(f"{graph_dir}/nodes/*.parquet"))[0]
    ids = pq.read_table(node_file, columns=["id"]).column("id").to_pylist()
    seeds = ",".join(str(i) for i in ids[:3])

    out = str(tmp_path / "sm")
    assert cli.main([
        "spam-mass", "--graph", graph_dir, "--seeds", seeds,
        "--max-iterations", "20", "--output", out,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["pr_iterations"] >= 1 and len(rep["top_spam_mass"]) == 5
    assert all(0.0 <= r["spam_mass"] <= 1.0 for r in rep["top_spam_mass"])
    written = pq.read_table(sorted(glob.glob(f"{out}/*.parquet"))[0])
    assert {"id", "pr", "tr", "spam_mass"} <= set(written.column_names)

    out2 = str(tmp_path / "resolved")
    assert cli.main(["resolve-chains", "--redirects", red_path, "--output", out2]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (rep2["resolved"], rep2["cycles"], rep2["max_hops"]) == (5, 3, 5)
    assert rep2["rounds"] <= 4  # ceil(log2(8)) + 1
    import pyarrow as pa

    res = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{out2}/*.parquet"))]
    ).to_pylist()
    got = {r["src"]: (r["final_dst"], r["hops"], r["is_cycle"]) for r in res}
    assert got[1] == (6, 5, False)
    assert got[10] == (None, None, True)
