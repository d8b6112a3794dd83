"""Unit tests for behavior-sequence analytics and distribution stats
(round-5 widening): funnel ordering semantics, Markov normalization,
path extraction, and the closed-form checks for Gini / power-law MLE."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from plwordnet_spark.behavior import funnel, markov_transitions, top_paths
from plwordnet_spark.graph.stats import gini_from_histogram, powerlaw_alpha


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def events(spark):
    # user 1: full ordered funnel; user 2: purchase BEFORE click (must
    # stall at step 2); user 3: view only; user 4: click without view
    # (never enters the funnel).
    rows = [
        (1, _ts(1), 1, "view"),
        (2, _ts(2), 1, "click"),
        (3, _ts(3), 1, "purchase"),
        (4, _ts(1), 2, "view"),
        (5, _ts(2), 2, "purchase"),
        (6, _ts(3), 2, "click"),
        (7, _ts(1), 3, "view"),
        (8, _ts(5), 4, "click"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_ordering_semantics(events):
    got = {
        r["step"]: (r["step_name"], r["users"])
        for r in funnel(events, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_requires_steps(events):
    with pytest.raises(ValueError):
        funnel(events, [])


def test_markov_transitions_rows_normalize(events):
    rows = markov_transitions(events).collect()
    # per-user streams: 1: v>c>p, 2: v>p>c, 3: v, 4: c
    got = {(r["prev_type"], r["event_type"]): (r["n"], r["prob"]) for r in rows}
    assert got[("view", "click")] == (1, 0.5)
    assert got[("view", "purchase")] == (1, 0.5)
    assert got[("click", "purchase")] == (1, 1.0)
    assert got[("purchase", "click")] == (1, 1.0)
    # every out-row sums to 1
    sums: dict[str, float] = {}
    for (prev, _cur), (_n, p) in got.items():
        sums[prev] = sums.get(prev, 0.0) + p
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_top_paths_trigrams(events):
    rows = top_paths(events, length=3, n=10).collect()
    got = {r["path"]: r["n_occurrences"] for r in rows}
    assert got == {"view > click > purchase": 1, "view > purchase > click": 1}
    with pytest.raises(ValueError):
        top_paths(events, length=1)


def test_gini_uniform_is_zero(spark):
    hist = spark.createDataFrame([(5, 4)], "degree int, n_nodes int")
    assert gini_from_histogram(hist).collect()[0]["gini"] == pytest.approx(0.0)


def test_gini_matches_closed_form(spark):
    # degrees: [1, 1, 1, 97] -> classic estimator
    hist = spark.createDataFrame([(1, 3), (97, 1)], "degree int, n_nodes int")
    vals = [1, 1, 1, 97]
    n, tot = len(vals), sum(vals)
    expected = (
        2 * sum(i * x for i, x in enumerate(sorted(vals), start=1)) / (n * tot)
        - (n + 1) / n
    )
    assert gini_from_histogram(hist).collect()[0]["gini"] == pytest.approx(
        expected, abs=1e-6
    )


def test_powerlaw_alpha_matches_closed_form(spark):
    hist = spark.createDataFrame(
        [(1, 100), (2, 25), (4, 6), (8, 1)], "degree int, n_nodes int"
    )
    pairs = [(1, 100), (2, 25), (4, 6), (8, 1)]
    n_tail = sum(c for _d, c in pairs)
    expected = 1 + n_tail / sum(c * math.log(d / 0.5) for d, c in pairs)
    row = powerlaw_alpha(hist).collect()[0]
    assert row["n_tail"] == n_tail
    assert row["alpha"] == pytest.approx(expected, abs=1e-6)


def test_powerlaw_alpha_dmin_filters_tail(spark):
    hist = spark.createDataFrame(
        [(1, 100), (2, 25), (4, 6), (8, 1)], "degree int, n_nodes int"
    )
    pairs = [(2, 25), (4, 6), (8, 1)]
    n_tail = sum(c for _d, c in pairs)
    expected = 1 + n_tail / sum(c * math.log(d / 1.5) for d, c in pairs)
    row = powerlaw_alpha(hist, d_min=2).collect()[0]
    assert row["n_tail"] == n_tail
    assert row["alpha"] == pytest.approx(expected, abs=1e-6)


def test_cooccurrence_lift_matches_pure_python(spark):
    from plwordnet_spark.behavior import cooccurrence_lift

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "c"), (4, "c"),  # dup item in basket collapses
        (5, "d"),
    ]
    df = spark.createDataFrame(rows, "basket_id long, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["lift"])
        for r in cooccurrence_lift(df, min_pairs=1).collect()
    }
    from collections import Counter
    from itertools import combinations

    baskets = {}
    for g, it in rows:
        baskets.setdefault(g, set()).add(it)
    N = len(baskets)
    item_n = Counter(it for s in baskets.values() for it in s)
    pair_n = Counter(
        p for s in baskets.values() for p in combinations(sorted(s), 2)
    )
    for (a, b), nab in pair_n.items():
        assert got[(a, b)][0] == nab
        assert abs(got[(a, b)][1] - nab * N / (item_n[a] * item_n[b])) < 1e-12
    assert got.keys() == set(pair_n)


def test_cooccurrence_lift_caps_mega_baskets_and_floors_support(spark):
    from plwordnet_spark.behavior import cooccurrence_lift

    rows = [(1, f"i{k}") for k in range(10)] + [(2, "x"), (2, "y"), (3, "x"), (3, "y")]
    df = spark.createDataFrame(rows, "basket_id long, item string")
    got = cooccurrence_lift(df, min_pairs=2, max_basket_size=5).collect()
    # basket 1 (10 items) dropped by the cap; (x,y) co-occurs twice
    assert {(r["item_a"], r["item_b"], r["n_ab"]) for r in got} == {("x", "y", 2)}
