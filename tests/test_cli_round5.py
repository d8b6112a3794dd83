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


def test_cli_corpus_clean_pipeline(spark, tmp_path, capsys):
    rows = []
    for i in range(60):
        boiler = "accept cookies to continue\n" if i % 2 == 0 else ""
        body = f"{boiler}unique line alpha {i}\nunique line beta {i} tail words"
        rows.append((i, body, ["en", "de"][i % 2]))
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(docs_path)
    # benchmark shares doc 7's exact text -> doc 7 gets decontaminated away
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(1000, rows[7][1].replace("\n", " "))], "doc_id long, text string"
    ).write.parquet(bench_path)

    out = str(tmp_path / "clean")
    assert cli.main([
        "corpus-clean", "--documents", docs_path,
        "--line-min-count", "5", "--benchmark", bench_path,
        "--ngram", "3", "--max-contamination", "0.5",
        "--rates", "en=1.0,de=1.0", "--output", out,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["input"] == 60
    assert rep["after_line_dedup"] == 60  # unique lines keep every doc
    assert rep["contaminated_dropped"] == 1  # doc 7
    assert rep["sampled"] == 59
    kept = pq.read_table(sorted(glob.glob(f"{out}/*.parquet"))[0])
    texts = dict(zip(kept.column("doc_id").to_pylist(),
                     kept.column("text").to_pylist()))
    assert 7 not in texts
    # boilerplate line stripped from every surviving even doc
    assert all("accept cookies" not in t for t in texts.values())
    assert all(t for t in texts.values())


def test_cli_walk_corpus_pairs(spark, tmp_path):
    """walk-corpus end-to-end: edges parquet in, skip-gram pairs out,
    deterministic across runs."""
    import json

    from plwordnet_spark.cli import main

    edges = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(12)] + [(i, (i + 5) % 12) for i in range(12)],
        "src long, dst long",
    )
    epath = str(tmp_path / "edges")
    edges.write.parquet(epath)
    out1 = str(tmp_path / "pairs1")
    out2 = str(tmp_path / "pairs2")
    for out in (out1, out2):
        rc = main([
            "walk-corpus", "--edges", epath, "--length", "6",
            "--walks", "2", "--p", "2.0", "--q", "0.5",
            "--pairs", "--window", "2", "--output", out,
        ])
        assert rc == 0
    a = sorted(map(tuple, spark.read.parquet(out1).collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b and len(a) > 0


def test_cli_communities(spark, tmp_path):
    import json

    from plwordnet_spark.cli import main

    # two dense cliques + a bridge: expect 2 communities, positive Q
    edges = []
    for base in (0, 10):
        ids = list(range(base, base + 6))
        edges += [(i, j) for i in ids for j in ids if i < j]
    edges.append((0, 10))
    spark.createDataFrame(edges, "src long, dst long").write.parquet(
        str(tmp_path / "edges")
    )
    out = str(tmp_path / "labels")
    rc = main([
        "communities", "--edges", str(tmp_path / "edges"),
        "--levels", "2", "--rounds", "5", "--output", out,
    ])
    assert rc == 0
    labels = {r["id"]: r["label"] for r in spark.read.parquet(out).collect()}
    assert len(set(labels.values())) == 2
    assert len({labels[i] for i in range(6)}) == 1
    assert labels[0] != labels[10]
