"""Crawl-frontier scheduling and matching-based vertex cover."""

from __future__ import annotations

import pytest

FRONTIER = [
    # (doc_id, url, host, priority)
    (0, "https://a.com/0", "a.com", 10.0),
    (1, "https://a.com/1", "a.com", 30.0),
    (2, "https://a.com/2", "a.com", 20.0),
    (3, "https://b.com/3", "b.com", 5.0),
    (4, "https://b.com/4", "b.com", 5.0),  # tie -> url order
    (5, "https://c.com/5", "c.com", 1.0),
]


def test_schedule_frontier_slots_and_fetchers(spark):
    from plwordnet_spark.frontier import schedule_frontier
    from plwordnet_spark.textops.sampling import SAMPLE_A, SAMPLE_B, SAMPLE_P

    df = spark.createDataFrame(FRONTIER, ["doc_id", "url", "host", "priority"])
    rows = {r.doc_id: r for r in schedule_frontier(df, n_fetchers=4).collect()}
    # a.com: priority 30 > 20 > 10
    assert (rows[1].slot, rows[2].slot, rows[0].slot) == (0, 1, 2)
    # b.com tie broken by url ascending
    assert (rows[3].slot, rows[4].slot) == (0, 1)
    assert rows[5].slot == 0
    # one fetcher per host, derived from host's min doc_id
    for ids, key in [((0, 1, 2), 0), ((3, 4), 3), ((5,), 5)]:
        exp = (((key % SAMPLE_P) * SAMPLE_A + SAMPLE_B) % SAMPLE_P) % 4
        assert {rows[i].fetcher for i in ids} == {exp}
    # politeness invariant: no host fetched twice in one slot
    seen = {(r.host, r.slot) for r in rows.values()}
    assert len(seen) == len(rows)


def test_schedule_frontier_cap_and_validation(spark):
    from plwordnet_spark.frontier import schedule_frontier

    df = spark.createDataFrame(FRONTIER, ["doc_id", "url", "host", "priority"])
    capped = schedule_frontier(df, n_fetchers=4, max_urls_per_host=2).collect()
    assert len(capped) == 5  # a.com loses its rank-3 url (doc 0)
    assert not any(r.doc_id == 0 for r in capped)
    with pytest.raises(ValueError):
        schedule_frontier(df, n_fetchers=0)


def test_vertex_cover_covers_every_edge_and_is_2approx(spark):
    from plwordnet_spark.graph.matching import maximal_matching, vertex_cover

    edges = [(i * 37 % 25, (i * 53 + 11) % 25) for i in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, ["src", "dst"])
    cover = {r.id for r in vertex_cover(spark, df).collect()}
    for u, v in edges:
        assert u in cover or v in cover
    n_matched = maximal_matching(spark, df).count()
    assert len(cover) == 2 * n_matched


class TestCanonicalUrl:
    CASES = {
        # every rule in one URL: fragment, case, www, default port,
        # trailing slash, tracking + unsorted params
        "HTTPS://WWW.News.Example.COM:443/Doc/12/?utm_source=x&z=en&a=3#f":
            "https://news.example.com/Doc/12?a=3&z=en",
        "http://example.com:80/A/B?b=2&a=1": "http://example.com/A/B?a=1&b=2",
        # bare host gains the root path; path case is preserved
        "https://example.com": "https://example.com/",
        "https://Example.com/Path/": "https://example.com/Path",
        # tracking-only query vanishes entirely
        "http://example.com/?utm_campaign=c": "http://example.com/",
        "https://example.com/x?gclid=1&ref=h&keep=1&utm_x=2":
            "https://example.com/x?keep=1",
        # non-default port survives; :443 on http is NOT default
        "http://example.com:443/p": "http://example.com:443/p",
    }

    def test_rules(self, spark):
        from plwordnet_spark.frontier import canonical_url_expr
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(u,) for u in self.CASES], "url string"
        ).select("url", canonical_url_expr(F.col("url")).alias("c"))
        got = {r["url"]: r["c"] for r in df.collect()}
        assert got == self.CASES

    def test_keep_www_option(self, spark):
        from plwordnet_spark.frontier import canonical_url_expr
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("https://www.example.com/a",)], "url string"
        ).select(canonical_url_expr(F.col("url"), drop_www=False).alias("c"))
        assert df.first()["c"] == "https://www.example.com/a"
