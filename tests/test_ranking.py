"""BM25 / unigram surprisal / posting-list tests vs pure-Python oracles."""

from __future__ import annotations

import math

import pytest

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick quick fox"),
    (2, "lorem ipsum dolor sit amet"),
    (3, "brown dog brown dog brown dog"),
    (4, "fox"),
    (5, ""),
]


def _tok(t):
    return [w for w in t.lower().split() if w]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {d: _tok(t) for d, t in docs}
    n = len(docs)
    dls = {d: len(ws) for d, ws in toks.items() if ws}
    avgdl = sum(dls.values()) / len(dls)
    out = {}
    for t in terms:
        df = sum(1 for ws in toks.values() if t in ws)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, ws in toks.items():
            tf = ws.count(t)
            if tf:
                s = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dls[d] / avgdl)
                )
                m, tot = out.get(d, (0, 0.0))
                out[d] = (m + 1, tot + s)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_matches_pure_python(docs_df):
    from plwordnet_spark.textops.ranking import bm25_topk

    terms = ["fox", "brown", "missingterm"]
    rows = bm25_topk(docs_df, terms, k=10).collect()
    exp = _py_bm25(DOCS, terms)
    assert {r.doc_id for r in rows} == set(exp)
    for r in rows:
        m, s = exp[r.doc_id]
        assert r.n_terms_matched == m
        assert abs(r.score - s) < 1e-6
    # rank strictly follows (score desc, doc_id asc)
    ordered = sorted(rows, key=lambda r: r.rank)
    assert [r.rank for r in ordered] == list(range(1, len(rows) + 1))
    for a, b_ in zip(ordered, ordered[1:]):
        assert (a.score, -a.doc_id) >= (b_.score, -b_.doc_id)


def test_bm25_k_limits_and_validates(docs_df):
    from plwordnet_spark.textops.ranking import bm25_topk

    rows = bm25_topk(docs_df, ["fox", "brown"], k=2).collect()
    assert len(rows) == 2 and {r.rank for r in rows} == {1, 2}
    with pytest.raises(ValueError):
        bm25_topk(docs_df, [])


def test_unigram_surprisal_matches_pure_python(docs_df):
    from plwordnet_spark.textops.ranking import unigram_surprisal

    rows = unigram_surprisal(docs_df).collect()
    toks = {d: _tok(t) for d, t in DOCS}
    all_toks = [w for ws in toks.values() for w in ws]
    total = len(all_toks)
    cnt = {w: all_toks.count(w) for w in set(all_toks)}
    exp = {
        d: -sum(math.log(cnt[w] / total) for w in ws) / len(ws)
        for d, ws in toks.items()
        if ws
    }
    assert {r.doc_id for r in rows} == set(exp)  # empty doc 5 absent
    for r in rows:
        assert abs(r.surprisal - exp[r.doc_id]) < 1e-6
        assert r.n_tokens == len(toks[r.doc_id])
    # spammy repetition (doc 3) is less surprising than rare-vocab doc 2
    by_id = {r.doc_id: r.surprisal for r in rows}
    assert by_id[3] < by_id[2]


def test_build_postings_prunes_and_orders(docs_df):
    from plwordnet_spark.textops.ranking import build_postings

    rows = {r.term: r for r in build_postings(docs_df, min_df=2).collect()}
    # hapax terms pruned
    assert "lorem" not in rows and "lazy" not in rows
    assert rows["fox"].df == 3 and rows["fox"].postings == "0,1,4"
    assert rows["brown"].total_tf == 1 + 3
    # max_df_frac drops ubiquitous terms
    capped = {
        r.term
        for r in build_postings(
            docs_df, min_df=2, max_df_frac=0.4
        ).collect()
    }
    assert "fox" not in capped and "brown" in capped


def test_build_postings_bigrams(docs_df):
    from plwordnet_spark.textops.ranking import build_postings

    rows = {
        r.term: r
        for r in build_postings(docs_df, min_df=1, ngram=2).collect()
    }
    assert rows["brown_dog"].postings == "3"  # only doc 3 has the bigram
    assert rows["brown_dog"].total_tf == 3 and rows["brown_dog"].df == 1
    assert rows["the_quick"].postings == "0,1"
    assert "fox" not in rows  # unigrams absent in bigram mode
    with pytest.raises(ValueError):
        build_postings(docs_df, ngram=0)


def _py_bigram_surprisal(docs):
    from collections import Counter

    doc_pairs = {
        d: list(zip(ws, ws[1:]))
        for d, t in docs
        if len(ws := _tok(t)) >= 2
    }
    c_vw = Counter(p for ps in doc_pairs.values() for p in ps)
    c_v = Counter()
    for (v, _w), c in c_vw.items():
        c_v[v] += c
    out = {}
    for d, ps in doc_pairs.items():
        sraw = sum(-math.log(c_vw[p] / c_v[p[0]]) for p in ps)
        out[d] = (len(ps), round(sraw / len(ps), 6))
    return out


def test_bigram_surprisal_matches_pure_python(docs_df):
    from plwordnet_spark.textops.ranking import bigram_surprisal

    got = {
        r.doc_id: (r.n_bigrams, r.surprisal)
        for r in bigram_surprisal(docs_df).collect()
    }
    exp = _py_bigram_surprisal(DOCS)
    assert set(got) == set(exp)  # single-token and empty docs absent
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert got[d][1] == pytest.approx(exp[d][1], abs=1e-6)


def test_bigram_surprisal_order_sensitivity(spark):
    # same unigram profile, different transitions: the doc built from
    # one repeated common phrase scores LOWER than the doc that chains
    # each transition exactly once in scrambled order
    from plwordnet_spark.textops.ranking import (
        bigram_surprisal,
        unigram_surprisal,
    )

    corpus = [(i, "a b c d a b c d a b c d") for i in range(5)]
    corpus.append((100, "a b c d a b c d a b c d"))
    corpus.append((101, "d c b a d b a c d a c b"))
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    bi = {r.doc_id: r.surprisal for r in bigram_surprisal(df).collect()}
    assert bi[101] > bi[100]
    # the unigram gate cannot separate them (identical token bags)
    uni = {r.doc_id: r.surprisal for r in unigram_surprisal(df).collect()}
    assert uni[101] == pytest.approx(uni[100], abs=1e-9)
