"""Round-5 additions: TrustRank/spam mass, redirect-chain resolution,
anchor-text extraction + per-target term profiles."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from plwordnet_spark.corpus import generate_pages
from plwordnet_spark.extraction import oracle
from plwordnet_spark.graph.chains import resolve_chains
from plwordnet_spark.graph.anchors import anchor_term_topk, build_anchor_table
from plwordnet_spark.graph.trustrank import spam_mass, trustrank
from plwordnet_spark.cache import CacheScope


# ---------------------------------------------------------------------------
# TrustRank / spam mass
# ---------------------------------------------------------------------------

def _py_pagerank(edges, personalization=None, alpha=0.85, iters=60):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    if personalization is None:
        p = {v: 1.0 / n for v in nodes}
    else:
        k = len(personalization)
        p = {v: (1.0 / k if v in personalization else 0.0) for v in nodes}
    rank = dict(p)
    for _ in range(iters):
        nxt = {v: 0.0 for v in nodes}
        dangling = sum(rank[v] for v in nodes if v not in out)
        for s, ds in out.items():
            share = rank[s] / len(ds)
            for d in ds:
                nxt[d] += alpha * share
        for v in nodes:
            nxt[v] += p[v] * ((1 - alpha) + alpha * dangling)
        rank = nxt
    return rank


EDGES = [
    (1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (5, 4),
    (6, 5), (6, 4), (7, 6), (2, 7), (8, 1),
]


def test_trustrank_matches_pure_python(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    res = trustrank(spark, edges, seeds=[1, 2], tol=0.0, max_iterations=60)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want = _py_pagerank(EDGES, personalization={1, 2})
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_spam_mass_semantics_and_scope(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    pr = _py_pagerank(EDGES)
    tr = _py_pagerank(EDGES, personalization={1, 2})
    with CacheScope() as scope:
        res = spam_mass(
            spark, edges, seeds=[1, 2], tol=0.0, max_iterations=60, scope=scope
        )
        got = {r["id"]: (r["pr"], r["tr"], r["spam_mass"]) for r in res.state.collect()}
        for v in pr:
            assert got[v][0] == pytest.approx(pr[v], abs=1e-9)
            assert got[v][1] == pytest.approx(tr[v], abs=1e-9)
            assert got[v][2] == pytest.approx((pr[v] - tr[v]) / pr[v], abs=1e-7)
    # a page far from the seeds carries more spam mass than the seed itself
    assert got[5][2] > got[1][2]


def test_trustrank_seed_frame_and_missing_seed(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    seeds_df = spark.createDataFrame([(1,), (999,)], "id long")  # 999 not in graph
    res = trustrank(spark, edges, seeds=seeds_df, tol=0.0, max_iterations=60)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want = _py_pagerank(EDGES, personalization={1})
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


# ---------------------------------------------------------------------------
# redirect chains
# ---------------------------------------------------------------------------

def _py_resolve(redirects):
    nxt = dict(redirects)
    out = {}
    for s in nxt:
        cur, hops, seen = nxt[s], 1, {s}
        while cur in nxt and cur not in seen:
            seen.add(cur)
            cur = nxt[cur]
            hops += 1
        if cur in nxt:  # stopped because of a revisit → loop
            out[s] = (None, None, True)
        else:
            out[s] = (cur, hops, False)
    return out


def test_resolve_chains_mixed_terminals_and_cycles(spark):
    # chain 1→2→3→100 (terminal), cycle 10→11→12→10, tail-into-cycle 9→10
    redirects = [(1, 2), (2, 3), (3, 100), (10, 11), (11, 12), (12, 10), (9, 10)]
    df = spark.createDataFrame(redirects, "src long, dst long")
    res = resolve_chains(spark, df)
    got = {
        r["src"]: (r["final_dst"], r["hops"], r["is_cycle"])
        for r in res.state.collect()
    }
    assert got == _py_resolve(redirects)
    assert got[1] == (100, 3, False)
    assert got[9] == (None, None, True)


def test_resolve_chains_random_functional_graph(spark):
    rng = random.Random(5)
    n = 400
    redirects = []
    for s in range(n):
        if s % 3 == 0:
            continue  # terminals
        d = rng.randrange(n)
        if d != s:
            redirects.append((s, d))
    df = spark.createDataFrame(redirects, "src long, dst long")
    res = resolve_chains(spark, df)
    got = {
        r["src"]: (r["final_dst"], r["hops"], r["is_cycle"])
        for r in res.state.collect()
    }
    assert got == _py_resolve(redirects)
    # O(log n) rounds, not O(chain length)
    assert res.iterations <= math.ceil(math.log2(len(redirects))) + 1


def test_resolve_chains_empty_and_self_redirect(spark):
    df = spark.createDataFrame([(5, 5)], "src long, dst long")
    res = resolve_chains(spark, df)
    assert res.state.count() == 0


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def test_extract_anchors_oracle_semantics():
    html = (
        '<a href="http://x.com/a">Big <b>Deal</b></a>'
        '<a href="#frag">skip</a>'
        '<a href="mailto:a@b.c">skip</a>'
        '<a href="https://y.org/p/">C&amp;A  spaced</a>'
        '<a href="https://img.net/i"><img src="z.png"/></a>'
    )
    got = oracle.extract_anchors(html)
    assert got == [
        ("https://x.com/a", "Big Deal"),
        ("https://y.org/p", "C&A spaced"),
        ("https://img.net/i", ""),
    ]
    # target normalization byte-identical to extract_links
    assert [u for u, _ in got] == oracle.extract_links(html)


def test_anchor_udf_matches_oracle_on_corpus(spark):
    pages = generate_pages(spark, 60, seed=42)
    table = build_anchor_table(pages)
    got = {
        (r["src_url"], r["dst_url"], r["anchor"]): r["weight"]
        for r in table.collect()
    }
    want = {}
    for row in pages.select("url", "html").collect():
        for u, a in oracle.extract_anchors(bytes(row["html"]).decode("utf-8")):
            key = (row["url"], u, a)
            want[key] = want.get(key, 0.0) + 1.0
    assert got == want


def test_anchor_term_topk_ranks_and_ties(spark):
    rows = [
        ("s1", "d1", "alpha beta"),
        ("s2", "d1", "alpha gamma"),
        ("s3", "d1", "beta"),
        ("s4", "d2", ""),
        ("s5", "d2", "solo"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")
    got = {
        (r["dst"], r["rank"]): (r["term"], r["n"])
        for r in anchor_term_topk(df, top_k=2).collect()
    }
    assert got[("d1", 1)] == ("alpha", 2)
    assert got[("d1", 2)] == ("beta", 2)  # tie with beta=2: term asc
    assert got[("d2", 1)] == ("solo", 1)
    assert ("d2", 2) not in got
