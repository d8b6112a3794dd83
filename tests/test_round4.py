"""Round-4 additions: delta-stepping checkpoint/resume, landmark
checkpointing, EdgeLog legacy compaction cadence, jaccard pair caching."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _weighted_graph(spark, seed=1, n=40, m=160):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(n), rng.randrange(n), round(0.1 + 2.4 * rng.random(), 3))
        for _ in range(m)
    ]
    rows = [(s, d, w) for s, d, w in rows if s != d]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _dist_map(res):
    return {r.id: r.dist for r in res.state.collect()}


def _assert_dist_equal(got, want):
    assert got.keys() == want.keys()
    for k in want:
        if want[k] is None:
            assert got[k] is None, k
        else:
            assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


# --- delta-stepping checkpoint/resume (VERDICT r3 task 3) -----------------


def test_delta_stepping_kill_and_resume_mid_bucket(spark, tmp_path):
    """A run killed mid-bucket (round budget exhausted inside a light
    fixpoint) and resumed from its durable snapshot must produce the
    identical distance map — and the same total round count — as an
    uninterrupted run. The outer loop re-derives the active bucket from
    min pending dist, so no bucket/phase cursor is persisted."""
    from plwordnet_spark.graph.bfs import delta_stepping_sssp
    from plwordnet_spark.storage.snapshots import SnapshotStore

    edges = _weighted_graph(spark)
    full = delta_stepping_sssp(spark, edges, sources=[0], delta=0.5, directed=True)
    assert full.converged and full.iterations >= 4
    want = _dist_map(full)

    # kill at a round that is mid-work (its frontier was non-empty, so
    # the bucket it was processing had not drained) and not the last
    kill_at = next(
        i for i, m in enumerate(full.metrics, 1)
        if i >= 2 and m["frontier_rows"] > 0 and i < full.iterations
    )
    ckpt = str(tmp_path / "ds_ckpt")
    partial = delta_stepping_sssp(
        spark, edges, sources=[0], delta=0.5, directed=True,
        max_rounds=kill_at, checkpoint_dir=ckpt, checkpoint_interval=1,
    )
    assert not partial.converged
    assert partial.iterations == kill_at  # exact budget, no heavy overshoot
    store = SnapshotStore(spark, ckpt)
    latest = store.latest()
    assert latest is not None and latest[1]["iteration"] == kill_at

    resumed = delta_stepping_sssp(
        spark, edges, sources=[0], delta=0.5, directed=True,
        checkpoint_dir=ckpt, checkpoint_interval=1, resume=True,
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    _assert_dist_equal(_dist_map(resumed), want)
    # resuming a finished run is a no-op that reports convergence
    again = delta_stepping_sssp(
        spark, edges, sources=[0], delta=0.5, directed=True,
        checkpoint_dir=ckpt, resume=True,
    )
    assert again.converged and again.iterations == full.iterations
    _assert_dist_equal(_dist_map(again), want)


def test_delta_stepping_resume_after_drain_round_kill(spark, tmp_path):
    """Kill landing exactly on a bucket-DRAIN round (light fixpoint just
    emptied, heavy relax not yet run) must not lose the bucket's heavy
    relaxation: the drained nodes are settled (changed=False), so only
    the resume-side pending-heavy replay can deliver their heavy edges.
    Minimal repro: single heavy edge 0->1 (w=5 > delta=2); round 1 is
    the drain round; killing there and resuming must still yield
    dist(1)=5 rather than NULL with premature convergence."""
    from plwordnet_spark.graph.bfs import delta_stepping_sssp

    edges = spark.createDataFrame(
        [(0, 1, 5.0)], "src long, dst long, weight double"
    )
    ckpt = str(tmp_path / "drain_ckpt")
    part = delta_stepping_sssp(
        spark, edges, sources=[0], delta=2.0, directed=True,
        max_rounds=1, checkpoint_dir=ckpt, checkpoint_interval=1,
    )
    assert part.iterations == 1 and not part.converged
    assert part.metrics[-1]["phase"] == "light"
    assert part.metrics[-1]["frontier_rows"] == 0
    resumed = delta_stepping_sssp(
        spark, edges, sources=[0], delta=2.0, directed=True,
        checkpoint_dir=ckpt, checkpoint_interval=1, resume=True,
    )
    assert resumed.converged
    got = _dist_map(resumed)
    assert got[0] == 0.0
    assert got[1] == 5.0  # the heavy relax the kill interrupted

    # multi-bucket variant: heavy chain 0-(5)->1-(5)->2 with a light
    # detour 0-(1)->3; kill on bucket 0's drain round, resume must still
    # settle the whole chain
    edges2 = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 5.0), (0, 3, 1.0)],
        "src long, dst long, weight double",
    )
    ckpt2 = str(tmp_path / "drain_ckpt2")
    full = delta_stepping_sssp(spark, edges2, sources=[0], delta=2.0, directed=True)
    kill_at = next(
        i for i, m in enumerate(full.metrics, 1)
        if m["phase"] == "light" and m["frontier_rows"] == 0
    )
    delta_stepping_sssp(
        spark, edges2, sources=[0], delta=2.0, directed=True,
        max_rounds=kill_at, checkpoint_dir=ckpt2, checkpoint_interval=1,
    )
    resumed2 = delta_stepping_sssp(
        spark, edges2, sources=[0], delta=2.0, directed=True,
        checkpoint_dir=ckpt2, checkpoint_interval=1, resume=True,
    )
    _assert_dist_equal(_dist_map(resumed2), _dist_map(full))


def test_delta_stepping_checkpointed_run_matches_plain(spark, tmp_path):
    """checkpoint_dir must not perturb results; retention keeps the
    snapshot count bounded and the final state is always snapshotted."""
    from plwordnet_spark.graph.bfs import delta_stepping_sssp
    from plwordnet_spark.storage.snapshots import SnapshotStore

    edges = _weighted_graph(spark, seed=2)
    plain = delta_stepping_sssp(spark, edges, sources=[0], delta=1.0)
    ckpt = str(tmp_path / "ds_ckpt2")
    ck = delta_stepping_sssp(
        spark, edges, sources=[0], delta=1.0,
        checkpoint_dir=ckpt, checkpoint_interval=3,
    )
    _assert_dist_equal(_dist_map(ck), _dist_map(plain))
    store = SnapshotStore(spark, ckpt)
    live = [e for e in store.manifest() if not e.get("expired")]
    assert 1 <= len(live) <= 3  # keep_last=2 retention + final snapshot
    assert live[-1]["iteration"] == ck.iterations
    resume_fail = pytest.raises(
        ValueError, delta_stepping_sssp, spark, edges, sources=[0],
        delta=1.0, resume=True,
    )
    assert "checkpoint_dir" in str(resume_fail.value)


# --- landmark distances: durable checkpointing (VERDICT r3 task 7) --------


def test_landmark_distances_checkpoint_dir(spark, tmp_path):
    """landmark_distances with a checkpoint_dir rides the runner's
    durable snapshots and returns the same sparse (id, landmark, dist)
    table as the in-memory path."""
    from plwordnet_spark.graph.bfs import landmark_distances
    from plwordnet_spark.storage.snapshots import SnapshotStore

    rng = random.Random(7)
    rows = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    rows = [(s, d) for s, d in rows if s != d]
    edges = spark.createDataFrame(rows, "src long, dst long")
    plain = landmark_distances(spark, edges, landmarks=[0, 3, 5])
    want = {(r.id, r.landmark): r.dist for r in plain.state.collect()}
    ckpt = str(tmp_path / "lm_ckpt")
    ck = landmark_distances(
        spark, edges, landmarks=[0, 3, 5], checkpoint_dir=ckpt,
        checkpoint_interval=2,
    )
    got = {(r.id, r.landmark): r.dist for r in ck.state.collect()}
    assert got == want
    assert SnapshotStore(spark, ckpt).latest() is not None


# --- EdgeLog: legacy entries must not skew compaction cadence (ADVICE) ----


def test_edgelog_legacy_entries_dont_trigger_early_compaction(spark, tmp_path):
    """Snapshots without a 'kind' metric (pre-delta format) are bases in
    _chain(); the compaction counter must default them the same way, or
    one legacy base + one fresh delta would compact at compact_every=2."""
    from plwordnet_spark.storage.snapshots import SnapshotStore
    from plwordnet_spark.streaming.ingest import EdgeLog

    root = str(tmp_path / "log")
    legacy = spark.createDataFrame(
        [(1, 2, 1, 1.0)], "src long, dst long, rel_id int, weight double"
    )
    SnapshotStore(spark, root).write(legacy, 0, {"batch_id": 0})  # no 'kind'
    log = EdgeLog(spark, root, compact_every=2)
    delta = spark.createDataFrame(
        [(2, 3, 1, 1.0)], "src long, dst long, rel_id int, weight double"
    )
    log.append(delta, batch_id=1, metrics={"batch_id": 1})
    kinds = [
        e.get("metrics", {}).get("kind", "base")
        for e in log.store.manifest() if not e.get("expired")
    ]
    # one legacy base + one delta, and NO compaction base appended yet
    assert kinds == ["base", "delta"]
    # a second delta reaches the threshold and compacts as configured
    log.append(
        spark.createDataFrame(
            [(3, 4, 1, 1.0)], "src long, dst long, rel_id int, weight double"
        ),
        batch_id=2, metrics={"batch_id": 2},
    )
    live = [e for e in log.store.manifest() if not e.get("expired")]
    assert [e["metrics"].get("kind", "base") for e in live] == ["base"]
    merged, _ = log.latest()
    assert merged.count() == 3


# --- batched personalized PageRank (K seeds, one composite loop) ----------


def test_ppr_batch_matches_single_personalized(spark):
    """Each seed's vector in the composite batch must equal the single
    personalized pagerank with a one-hot teleport on that seed; rows
    absent from the sparse composite state are exactly-zero ranks."""
    from plwordnet_spark.graph.pagerank import pagerank
    from plwordnet_spark.graph.ppr import ppr_batch

    rng = random.Random(13)
    rows = [(rng.randrange(50), rng.randrange(50), 1.0) for _ in range(150)]
    rows = [(s, d, w) for s, d, w in rows if s != d]
    # add a dangling node so the per-seed dangling mass path is exercised
    rows.append((3, 777, 1.0))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    seeds = [0, 7, 21]

    batch = ppr_batch(
        spark, edges, seeds, tol=0.0, max_iterations=20, weighted=False
    )
    got = {(r.id, r.seed): r.rank for r in batch.state.collect()}
    for s in seeds:
        single = pagerank(
            spark, edges, tol=0.0, max_iterations=20, weighted=False,
            personalization=spark.createDataFrame(
                [(s, 1.0)], "id long, p double"
            ),
            check_interval=1,
        )
        want = {r.id: r.rank for r in single.state.collect()}
        for node, v in want.items():
            gv = got.get((node, s), 0.0)  # sparse: missing = exactly 0
            assert abs(gv - v) < 1e-9, (s, node, gv, v)
    # seeds outside the node universe are dropped (no phantom rows) and
    # a DUPLICATED seed must not double its teleport/init mass
    b2 = ppr_batch(spark, edges, [0, 0, 999_999], tol=0.0, max_iterations=3,
                   weighted=False)
    assert b2.state.filter("seed = 999999").count() == 0
    mass0 = b2.state.filter("seed = 0").groupBy().sum("rank").first()[0]
    assert abs(mass0 - 1.0) < 1e-9


# --- link prediction: Adamic-Adar / common neighbors ----------------------


def _py_adamic_adar(pairs, max_degree=None):
    """Pure-Python oracle over an undirected simple graph."""
    import math
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in pairs:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    aa = defaultdict(float)
    cn = defaultdict(int)
    for z, zn in nbrs.items():
        if max_degree is not None and len(zn) > max_degree:
            continue
        zs = sorted(zn)
        for i, a in enumerate(zs):
            for b in zs[i + 1:]:
                aa[(a, b)] += 1.0 / math.log(len(zn))
                cn[(a, b)] += 1
    return aa, cn


def test_adamic_adar_matches_python(spark):
    import random

    rng = random.Random(5)
    pairs = {(rng.randrange(40), rng.randrange(40)) for _ in range(140)}
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "src long, dst long")

    from plwordnet_spark.graph.linkpred import adamic_adar, common_neighbors

    want_aa, want_cn = _py_adamic_adar(pairs)
    got_aa = {(r.a, r.b): r.score for r in adamic_adar(edges).collect()}
    assert got_aa.keys() == want_aa.keys()
    for k, v in want_aa.items():
        assert abs(got_aa[k] - v) < 1e-9, (k, got_aa[k], v)
    got_cn = {(r.a, r.b): r.common for r in common_neighbors(edges).collect()}
    assert got_cn == dict(want_cn)

    # degree cap: mega-hub z excluded from the shared-neighbor role
    hub_pairs = pairs + [(99, i) for i in range(30)]
    hub_edges = spark.createDataFrame(hub_pairs, "src long, dst long")
    want_cap, _ = _py_adamic_adar(hub_pairs, max_degree=10)
    got_cap = {
        (r.a, r.b): r.score
        for r in adamic_adar(hub_edges, max_degree=10).collect()
    }
    assert got_cap.keys() == want_cap.keys()
    for k, v in want_cap.items():
        assert abs(got_cap[k] - v) < 1e-9

    # top_k is PER NODE (recommender view): every node keeps its k best
    # candidates even when it is the larger endpoint of its best pairs
    got_top = adamic_adar(edges, top_k=2).collect()
    per_node = {}
    for r in got_top:
        per_node.setdefault(r.node, []).append((r.score, r.candidate))
    # per-node expectation from the symmetric closure of the pair scores
    want_per_node = {}
    for (a, b), s in want_aa.items():
        want_per_node.setdefault(a, []).append((s, b))
        want_per_node.setdefault(b, []).append((s, a))
    # EVERY scored node must appear — a window regression dropping a
    # whole partition must fail, not be silently skipped
    assert per_node.keys() == want_per_node.keys()
    # sort on ROUNDED score: the Python oracle's different addition
    # order can put two tied candidates 1 ulp apart, flipping the
    # -score ordering vs Spark's exact tie broken by candidate id
    key = lambda t: (-round(t[0], 9), t[1])  # noqa: E731
    for node, rows in per_node.items():
        best = sorted(want_per_node[node], key=key)[:2]
        assert sorted(rows, key=key) == [
            (pytest.approx(s), c) for s, c in best
        ]


# --- production topology end-to-end: ingest → EdgeLog → warm PageRank -----


def test_incremental_ingest_to_warm_pagerank(spark, tmp_path):
    """The north-star topology in one test: a page stream lands in the
    EdgeLog (O(batch) deltas), PageRank runs on the folded table, MORE
    pages arrive, and the next PageRank warm-starts from the previous
    ranks — converging to the SAME fixpoint as a cold run on the grown
    graph. Iteration count is asserted only loosely here: crawl 2 is a
    disjoint url space, so the warm seed's per-component mass error is
    comparable to a uniform start's structural error and warm ≈ cold
    (measured sweep: 86-95 vs 82-91 iterations across crawl-2 sizes);
    the warm-start SPEED benefit on same-node-set growth is proven by
    test_pagerank_warm_start_after_edge_merge."""
    from plwordnet_spark.corpus import generate_pages
    from plwordnet_spark.graph.pagerank import pagerank
    from plwordnet_spark.streaming.ingest import (
        EdgeLog,
        read_page_stream,
        stream_pages_to_edges,
    )

    edges_dir = str(tmp_path / "edges")
    crawl1 = str(tmp_path / "crawl1")
    generate_pages(spark, 80, seed=1).write.parquet(crawl1)
    q = stream_pages_to_edges(
        spark, read_page_stream(spark, crawl1, max_files_per_trigger=1),
        edges_dir, str(tmp_path / "ck1"), compact_every=3,
    )
    q.awaitTermination(120)
    log = EdgeLog(spark, edges_dir, compact_every=3)
    gen1_edges, _ = log.latest()
    r1 = pagerank(spark, gen1_edges, tol=1e-10, max_iterations=100)

    # second crawl drop: disjoint seed → new pages AND new links
    crawl2 = str(tmp_path / "crawl2")
    generate_pages(spark, 80, seed=2).write.parquet(crawl2)
    q = stream_pages_to_edges(
        spark, read_page_stream(spark, crawl2, max_files_per_trigger=1),
        edges_dir, str(tmp_path / "ck2"), compact_every=3,
    )
    q.awaitTermination(120)
    gen2_edges, _ = log.latest()
    assert gen2_edges.count() > gen1_edges.count()

    cold = pagerank(spark, gen2_edges, tol=1e-10, max_iterations=100)
    # caller-side warm-start shape: previous ranks where known, uniform
    # share for crawl-2's new nodes, then NORMALIZED to total mass 1 —
    # an unnormalized seed carries excess probability mass that only
    # decays at rate alpha per iteration and can make the warm run
    # SLOWER than cold (observed: 98 vs 89 iterations unnormalized)
    n2 = (
        gen2_edges.selectExpr("src AS id").union(gen2_edges.selectExpr("dst AS id"))
        .distinct().count()
    )
    raw = (
        gen2_edges.selectExpr("src AS id").union(gen2_edges.selectExpr("dst AS id"))
        .distinct()
        .join(r1.state.withColumnRenamed("rank", "r0"), "id", "left")
        .selectExpr("id", f"coalesce(r0, 1.0/{n2}) AS rank")
    )
    mass = raw.groupBy().sum("rank").first()[0]
    seeds = raw.selectExpr("id", f"rank / {mass!r} AS rank")
    warm = pagerank(
        spark, gen2_edges, tol=1e-10, max_iterations=100, initial_ranks=seeds
    )
    assert warm.converged and cold.converged
    assert warm.iterations <= cold.iterations + 10
    got = {r.id: r.rank for r in warm.state.collect()}
    want = {r.id: r.rank for r in cold.state.collect()}
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-8)


# --- hot-src split join: identical ranks, out-degree skew handled ---------


def test_pagerank_hot_src_split_matches_plain(spark):
    """The hot-src split (round-robin hot slice + broadcast hot ranks)
    must produce identical ranks to the co-partitioned join, including
    on a graph where one src owns a large share of all edges."""
    from plwordnet_spark.graph.pagerank import pagerank

    rng = random.Random(11)
    n = 60
    rows = [(rng.randrange(n), rng.randrange(n), 1.0) for _ in range(240)]
    # hub src 0: out-edges to half the graph (way above any threshold)
    rows += [(0, d, 1.0) for d in range(1, n, 2)]
    rows = [(s, d, w) for s, d, w in rows if s != d]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")

    plain = pagerank(spark, edges, tol=1e-10, max_iterations=40)
    split = pagerank(
        spark, edges, tol=1e-10, max_iterations=40, hot_src_threshold=10
    )
    want = {r.id: r.rank for r in plain.state.collect()}
    got = {r.id: r.rank for r in split.state.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert split.iterations == plain.iterations
    # threshold above every out-degree = no split, same code path result
    nosplit = pagerank(
        spark, edges, tol=1e-10, max_iterations=40, hot_src_threshold=10**9
    )
    got2 = {r.id: r.rank for r in nosplit.state.collect()}
    for k in want:
        assert abs(got2[k] - want[k]) < 1e-12


# --- bucketed point lookup prunes to one bucket ---------------------------


def test_bucket_pruned_point_lookup(spark):
    """A key-equality lookup on a table bucketed by that key must scan
    one bucket (SelectedBucketsCount: 1 out of N) and return the same
    rows as the unbucketed scan."""
    from plwordnet_spark.storage.bucketed import (
        bucket_pruned_scans,
        drop_table,
        write_bucketed,
    )

    df = spark.range(200).select(
        F.col("id").alias("vec_id"), (F.col("id") * 3).alias("payload")
    )
    # drop_table also clears a crashed earlier run's managed location
    # (saveAsTable refuses with LOCATION_ALREADY_EXISTS otherwise)
    drop_table(spark, "t_bucket_prune")
    write_bucketed(df, "t_bucket_prune", ["vec_id"], n_buckets=8,
                   sort_cols=["vec_id"])
    lookup = spark.table("t_bucket_prune").filter(F.col("vec_id") == 42)
    with bucket_pruned_scans(spark):
        plan = lookup._jdf.queryExecution().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert [(r.vec_id, r.payload) for r in lookup.collect()] == [(42, 126)]
    # outside the context the planner's auto rule is back in charge
    assert (
        spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        == "true"
    )
    drop_table(spark, "t_bucket_prune")


# --- exact_jaccard_for_pairs materializes unmaterialized pairs (ADVICE) ---


def test_exact_jaccard_caches_pairs_plan(spark):
    """The size-conditional broadcast check counts the pairs frame; an
    uncached pairs plan must be persisted so the joins reuse the
    materialization instead of re-executing the candidate pipeline."""
    from pyspark import StorageLevel

    from plwordnet_spark.textops.dedup import exact_jaccard_for_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over a lazy dog"),
         (3, "completely different text with other words entirely")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    assert pairs.storageLevel == StorageLevel.NONE
    out = exact_jaccard_for_pairs(pairs, docs)
    rows = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert rows[(1, 2)] > 0.3
    assert pairs.storageLevel != StorageLevel.NONE  # persisted by the call
    pairs.unpersist()
