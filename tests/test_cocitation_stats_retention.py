"""Round-5 additions, batch 2: co-citation / bibliographic coupling,
partition modularity, cohort retention."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from plwordnet_spark.cache import CacheScope
from plwordnet_spark.graph.cocitation import bibliographic_coupling, cocitation
from plwordnet_spark.graph.stats import modularity
from plwordnet_spark.temporal import cohort_retention


EDGES = [
    (1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (3, 11), (3, 12),
    (4, 13), (5, 13), (1, 13),
]


def _py_two_path(edges, pivot_idx):
    fan = defaultdict(set)
    for e in edges:
        fan[e[pivot_idx]].add(e[1 - pivot_idx])
    out = defaultdict(int)
    for leaves in fan.values():
        ls = sorted(leaves)
        for i in range(len(ls)):
            for j in range(i + 1, len(ls)):
                out[(ls[i], ls[j])] += 1
    return dict(out)


def test_cocitation_matches_pure_python(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        (r["a"], r["b"]): r["strength"] for r in cocitation(df).collect()
    }
    assert got == _py_two_path(EDGES, 0)
    # pages 10 and 11 are co-cited by sources 1 and 2
    assert got[(10, 11)] == 2


def test_bibliographic_coupling_matches_pure_python(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        (r["a"], r["b"]): r["strength"]
        for r in bibliographic_coupling(df).collect()
    }
    assert got == _py_two_path(EDGES, 1)
    # srcs 1 and 2 share targets 10 and 11
    assert got[(1, 2)] == 2


def test_cocitation_max_fanout_excludes_hub_sources(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    # src 1 and 2 have fan-out 3; cap at 2 keeps only src 3 (10,11,12?)
    with CacheScope() as scope:
        got = {
            (r["a"], r["b"]): r["strength"]
            for r in cocitation(df, max_fanout=2, scope=scope).collect()
        }
    capped = [e for e in EDGES if e[0] not in (1, 2)]
    assert got == _py_two_path(capped, 0)


def test_cocitation_topk_view(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    rows = cocitation(df, top_k=1).collect()
    best = {r["node"]: (r["candidate"], r["strength"]) for r in rows}
    # each node appears once (top-1), symmetric view
    assert len(rows) == len(best)
    py = _py_two_path(EDGES, 0)
    sym = defaultdict(dict)
    for (a, b), s in py.items():
        sym[a][b] = s
        sym[b][a] = s
    for node, (cand, s) in best.items():
        want = max(sym[node].items(), key=lambda kv: (kv[1], -kv[0]))
        # tie-break: strength desc, candidate asc
        best_strength = max(sym[node].values())
        cands = sorted(k for k, v in sym[node].items() if v == best_strength)
        assert (cand, s) == (cands[0], best_strength)


def _nx_modularity(edges, comm):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    m = len(und)
    deg = defaultdict(int)
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    intra = sum(1 for a, b in und if comm.get(a, ("s", a)) == comm.get(b, ("s", b)))
    by_c = defaultdict(int)
    for v, d in deg.items():
        by_c[comm.get(v, ("s", v))] += d
    return intra / m - sum((d / (2 * m)) ** 2 for d in by_c.values())


def test_modularity_matches_networkx_formula(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4), (2, 1)]
    comm = {1: 100, 2: 100, 3: 100, 4: 200, 5: 200, 6: 200}
    e_df = spark.createDataFrame(edges, "src long, dst long")
    c_df = spark.createDataFrame(list(comm.items()), "id long, community long")
    got = modularity(e_df, c_df).collect()[0]["modularity"]
    assert got == pytest.approx(_nx_modularity(edges, comm), abs=1e-12)
    nx = pytest.importorskip("networkx")
    g = nx.Graph()
    g.add_edges_from(edges)
    want = nx.algorithms.community.modularity(g, [{1, 2, 3}, {4, 5, 6}])
    assert got == pytest.approx(want, abs=1e-12)


def test_modularity_missing_vertices_are_singletons(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    comm = {1: 7, 2: 7}  # 3 and 4 unlabeled
    e_df = spark.createDataFrame(edges, "src long, dst long")
    c_df = spark.createDataFrame(list(comm.items()), "id long, community long")
    got = modularity(e_df, c_df).collect()[0]["modularity"]
    assert got == pytest.approx(_nx_modularity(edges, comm), abs=1e-12)


def test_cohort_retention_weekly(spark):
    t0 = dt.datetime(2025, 1, 6)  # a Monday
    rows = [
        # user 1: first week 0, active weeks 0,1,3
        (1, t0), (1, t0 + dt.timedelta(days=8)), (1, t0 + dt.timedelta(days=22)),
        (1, t0 + dt.timedelta(days=1)),  # same week dup
        # user 2: first week 0, active week 0 only
        (2, t0 + dt.timedelta(days=3)),
        # user 3: first week 1, active weeks 1,2
        (3, t0 + dt.timedelta(days=7)), (3, t0 + dt.timedelta(days=15)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_start"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    w0, w1 = t0, t0 + dt.timedelta(days=7)
    assert got == {
        (w0, 0): 2, (w0, 1): 1, (w0, 3): 1,
        (w1, 0): 1, (w1, 1): 1,
    }


def test_cohort_retention_monthly_calendar_exact(spark):
    rows = [
        (1, dt.datetime(2025, 1, 15)),
        (1, dt.datetime(2025, 3, 2)),  # offset 2 months despite 28-day Feb
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["period_offset"]: r["n_users"]
        for r in cohort_retention(df, period="month").collect()
    }
    assert got == {0: 1, 2: 1}
    with pytest.raises(ValueError):
        cohort_retention(df, period="fortnight")
