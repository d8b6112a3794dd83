"""hop_histogram and weighted_sample_per_stratum vs pure-Python oracles."""

from __future__ import annotations

import math
from collections import deque

import pytest

# two components: a 5-path (0-1-2-3-4) and a triangle (10,11,12)
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]


def _py_hopplot(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    hist = {}
    for s in adj:
        seen = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in seen:
                    seen[w] = seen[u] + 1
                    q.append(w)
        for d in seen.values():
            if d > 0:
                hist[d] = hist.get(d, 0) + 1
    return hist


def test_hop_histogram_matches_bfs_oracle(spark):
    from plwordnet_spark.graph.stats import hop_histogram

    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    rows = hop_histogram(spark, edges).collect()
    exp = _py_hopplot(EDGES)
    got = {r.dist: r.n_pairs for r in rows}
    assert got == exp
    total = sum(exp.values())
    cum = 0
    for r in sorted(rows, key=lambda r: r.dist):
        cum += exp[r.dist]
        assert r.cum_pairs == cum
        assert abs(r.frac_cum - round(cum / total, 6)) < 1e-12
    # last row is the diameter and frac_cum hits exactly 1
    assert max(got) == 4 and rows and cum == total


def test_weighted_sample_matches_formula_and_is_partition_invariant(spark):
    from plwordnet_spark.textops.sampling import (
        SAMPLE_A,
        SAMPLE_B,
        SAMPLE_P,
        weighted_sample_per_stratum,
    )

    data = [
        (i, "en" if i % 2 == 0 else "pl", float(1 + (i * 37) % 100))
        for i in range(200)
    ] + [(900, "en", 0.0), (901, "pl", None)]  # zero/NULL weight excluded
    df = spark.createDataFrame(data, ["doc_id", "lang", "w"])

    def key(i, w):
        u = (((i % SAMPLE_P) * SAMPLE_A + SAMPLE_B) % SAMPLE_P + 1) / (
            SAMPLE_P + 1
        )
        return math.log(u) / w

    exp = {}
    for lang in ("en", "pl"):
        rows = [(i, w) for i, l, w in data if l == lang and w and w > 0]
        rows.sort(key=lambda t: (-key(*t), t[0]))
        exp[lang] = {i for i, _ in rows[:5]}

    got = weighted_sample_per_stratum(
        df, 5, weight_col="w", strata_col="lang"
    ).collect()
    for lang in ("en", "pl"):
        assert {r.doc_id for r in got if r.lang == lang} == exp[lang]
    assert not any(r.doc_id in (900, 901) for r in got)

    repart = weighted_sample_per_stratum(
        df.repartition(13), 5, weight_col="w", strata_col="lang"
    ).collect()
    assert {r.doc_id for r in repart} == {r.doc_id for r in got}

    with pytest.raises(ValueError):
        weighted_sample_per_stratum(df, 0, weight_col="w")


def test_weighted_sample_favors_heavy_rows(spark):
    from plwordnet_spark.textops.sampling import weighted_sample_per_stratum

    # 100 rows of weight 1 and 10 rows of weight 1000: the heavy rows
    # should dominate a k=8 sample (deterministic given the fixed draws)
    data = [(i, "x", 1.0) for i in range(100)] + [
        (1000 + i, "x", 1000.0) for i in range(10)
    ]
    df = spark.createDataFrame(data, ["doc_id", "lang", "w"])
    got = weighted_sample_per_stratum(
        df, 8, weight_col="w", strata_col="lang"
    ).collect()
    heavy = sum(1 for r in got if r.doc_id >= 1000)
    assert heavy >= 6
