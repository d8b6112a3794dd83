"""Round-3 regression tests: frontier-based BFS/SSSP, runner validation,
incremental ingest, size-conditional broadcast, HITS job-count cuts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# frontier-based BFS/SSSP (VERDICT r2 task 1)
# ---------------------------------------------------------------------------

def test_bfs_relaxes_frontier_not_reached_set(spark):
    """On a path graph the reached set grows linearly but the frontier is
    always exactly one node: per-round frontier_rows (the rows entering
    the next relax join) must stay at 1, not track |reached|."""
    from plwordnet_spark.graph.bfs import bfs_distances

    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    res = bfs_distances(spark, edges, sources=[0], max_iterations=n + 5)
    dists = {r.id: r.dist for r in res.state.collect()}
    assert dists == {i: i for i in range(n)}
    assert res.converged
    frontier = [m["frontier_rows"] for m in res.metrics]
    # every round discovers exactly one new node, then the frontier dries up
    assert all(f <= 1 for f in frontier)
    assert sum(frontier) == n - 1
    assert frontier[-1] == 0


def test_sssp_frontier_reemits_on_improvement(spark):
    """A node whose dist improves AFTER first discovery must re-enter the
    frontier and propagate the improvement (delta Bellman-Ford, not
    first-visit BFS)."""
    from plwordnet_spark.graph.bfs import sssp_distances

    # 0→1 heavy direct edge; cheap long way 0→2→3→1 discovered later;
    # 1→4 must end up with the improved upstream dist.
    edges = spark.createDataFrame(
        [
            (0, 1, 10.0),
            (0, 2, 1.0),
            (2, 3, 1.0),
            (3, 1, 1.0),
            (1, 4, 1.0),
        ],
        "src long, dst long, weight double",
    )
    res = sssp_distances(spark, edges, sources=[0], directed=True)
    dists = {r.id: r.dist for r in res.state.collect()}
    assert dists == {0: 0.0, 1: 3.0, 2: 1.0, 3: 2.0, 4: 4.0}
    # node 1 changed twice (10.0 then 3.0) → total frontier traffic is
    # still tiny and the run converged with an empty frontier
    assert res.converged
    assert res.metrics[-1]["frontier_rows"] == 0


# ---------------------------------------------------------------------------
# runner validation (ADVICE r2)
# ---------------------------------------------------------------------------

def test_retain_snapshots_rejects_below_two(spark):
    from plwordnet_spark.graph.pregel import PregelRunner

    for bad in (0, 1):
        with pytest.raises(ValueError):
            PregelRunner(spark, retain_snapshots=bad)
    PregelRunner(spark, retain_snapshots=2)  # boundary ok
    PregelRunner(spark, retain_snapshots=None)  # audit mode ok


def test_balance_arithmetic_low_zero_substitutes_one():
    from plwordnet_spark.datasets.balanced import balance_arithmetic

    got = balance_arithmetic(0, 50, 2.0)
    # reference embedder.py:908-913 with l_count substituted to 1
    assert got["add_examples"] == int(2.0 * (1 * (50 / 1)) + 1) - 1
