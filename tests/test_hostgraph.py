"""Host-graph projection: url→host parsing, weighted projection,
nepotistic-link ratio (round 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from plwordnet_spark.graph.hostgraph import (
    host_of,
    intra_host_ratio,
    project_to_hosts,
)


def test_host_of_parses_authority_forms(spark):
    cases = [
        ("https://example.org/p/1", "example.org"),
        ("http://EXAMPLE.org:8080/p?q=1", "example.org"),
        ("https://user:pw@Sub.Example.ORG:443/x/y", "sub.example.org"),
        ("https://example.org", "example.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["h"] for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == [h for _, h in cases]


def _toy(spark):
    # hosts: a={1,2}, b={3}, c={4}
    node_hosts = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id long, host string"
    )
    edges = spark.createDataFrame(
        [(1, 2, 2.0), (2, 1, 1.0), (1, 3, 1.0), (3, 4, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    return edges, node_hosts


def test_project_to_hosts_weighted(spark):
    edges, nh = _toy(spark)
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in project_to_hosts(edges, nh).collect()
    }
    assert got == {("a", "a"): 3.0, ("a", "b"): 2.0, ("b", "c"): 1.0}


def test_project_to_hosts_drop_intra_and_unweighted(spark):
    edges, nh = _toy(spark)
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in project_to_hosts(
            edges.select("src", "dst"), nh, drop_intra=True
        ).collect()
    }
    assert got == {("a", "b"): 2.0, ("b", "c"): 1.0}


def test_intra_host_ratio(spark):
    edges, nh = _toy(spark)
    got = {
        r["src_host"]: (r["n_intra"], r["n_total"], r["intra_ratio"])
        for r in intra_host_ratio(edges, nh).collect()
    }
    assert got["a"] == (3.0, 5.0, 0.6)
    assert got["b"] == (0.0, 1.0, 0.0)


def test_host_projection_on_built_graph_matches_domain_column(spark):
    """End-to-end: corpus pages → build_graph → host projection using
    host_of(url) must agree with build_graph's own domain column."""
    from plwordnet_spark.corpus import generate_pages
    from plwordnet_spark.graph.build import build_graph

    pages = generate_pages(spark, 300, seed=42)
    t = build_graph(pages)
    nh_url = t.nodes.select("id", host_of(F.col("url")).alias("host"))
    mismatch = (
        nh_url.join(t.nodes.select("id", "domain"), "id")
        .filter(F.col("host") != F.col("domain"))
        .count()
    )
    assert mismatch == 0
    hosts = project_to_hosts(t.edges, nh_url)
    # total projected weight == total edge weight (projection is lossless)
    total_edges = t.edges.agg(F.sum("weight")).first()[0]
    total_hosts = hosts.agg(F.sum("weight")).first()[0]
    assert abs(total_edges - total_hosts) < 1e-9
