"""End-to-end round-5 web pipeline: pages → anchors → redirect-resolved
edge table → host graph → spam mass.

The realistic crawl-normalization order: extract links AND anchors from
HTML, resolve the redirect table so every edge points at its FINAL
target (aliases collapse BEFORE dedup — otherwise one logical page
splits rank), then run host-level and trust analyses on the normalized
graph. Each stage is exact-checked against a pure-Python replay of the
same rule; the point of the test is that the stages compose (schemas,
id spaces, cache contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from plwordnet_spark.cache import CacheScope
from plwordnet_spark.corpus import generate_pages
from plwordnet_spark.graph.anchors import anchor_term_topk, build_anchor_table
from plwordnet_spark.graph.build import build_graph
from plwordnet_spark.graph.chains import resolve_chains
from plwordnet_spark.graph.hostgraph import backlink_diversity, project_to_hosts
from plwordnet_spark.graph.trustrank import spam_mass


def test_full_web_pipeline(spark):
    pages = generate_pages(spark, 250, seed=42).cache()

    # --- stage 1: links + anchors from the same HTML pass ------------
    g = build_graph(pages)
    edges = g.edges.select("src", "dst").distinct().cache()
    anchors = build_anchor_table(pages)
    profiles = anchor_term_topk(anchors, top_k=2)
    assert profiles.filter(F.col("rank") > 2).count() == 0
    assert anchors.count() > 0

    # --- stage 2: redirect resolution over node ids ------------------
    nodes = g.nodes.select("id").cache()
    ids = sorted(r["id"] for r in nodes.collect())
    # deterministic synthetic redirect table: every 5th node (by sorted
    # position) redirects to the next node in the ordering
    redirects = [
        (ids[i], ids[i + 1]) for i in range(0, len(ids) - 1) if i % 5 == 0
    ]
    red_df = spark.createDataFrame(redirects, "src long, dst long")
    resolved = resolve_chains(spark, red_df)
    res = {
        r["src"]: (r["final_dst"], r["is_cycle"]) for r in resolved.state.collect()
    }
    # python replay
    nxt = dict(redirects)
    for s in nxt:
        cur, seen = nxt[s], {s}
        while cur in nxt and cur not in seen:
            seen.add(cur)
            cur = nxt[cur]
        want = (None, True) if cur in nxt else (cur, False)
        assert res[s] == want

    # rewrite edge dsts through the resolved mapping (terminal targets
    # only; cycles keep the original dst — crawl policy choice)
    mapping = resolved.state.filter(~F.col("is_cycle")).select(
        F.col("src").alias("dst"), F.col("final_dst")
    )
    rewritten = (
        edges.join(mapping, "dst", "left")
        .select("src", F.coalesce("final_dst", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    # python replay of the rewrite
    final_of = {s: fd for s, (fd, cyc) in res.items() if not cyc}
    py_edges = {
        (s, final_of.get(d, d))
        for s, d in ((r["src"], r["dst"]) for r in edges.collect())
        if s != final_of.get(d, d)
    }
    got_edges = {(r["src"], r["dst"]) for r in rewritten.collect()}
    assert got_edges == py_edges

    # --- stage 3: host projection + trust on the normalized graph ----
    node_hosts = g.nodes.select("id", F.col("domain").alias("host"))
    hosts = project_to_hosts(rewritten, node_hosts)
    assert hosts.count() > 0
    bd = backlink_diversity(rewritten, node_hosts)
    row = bd.agg(F.min("host_diversity"), F.max("host_diversity")).collect()[0]
    assert 0.0 < row[0] <= row[1] <= 1.0

    seeds = nodes.limit(5).select("id")
    with CacheScope() as scope:
        sm = spam_mass(
            spark, rewritten, seeds, tol=0.0, max_iterations=20, scope=scope
        )
        stats = sm.state.agg(
            F.min("spam_mass"), F.max("spam_mass"), F.sum("pr"), F.sum("tr")
        ).collect()[0]
    assert stats[1] <= 1.0 + 1e-9          # spam mass never exceeds 1
    assert abs(stats[2] - 1.0) < 1e-6      # PR sums to 1
    assert abs(stats[3] - 1.0) < 1e-6      # TR sums to 1

    for df in (pages, edges, nodes, rewritten):
        df.unpersist()
