"""Count-min sketch over integer keys — mergeable heavy-hitter counts.

The third sketch in the engine's family (HyperLogLog distinct counts:
EdgeLog / q_approx_distinct; HyperBall balls: graph.structure), covering
the remaining streaming-analytics staple: FREQUENCY estimation in
sublinear space (Cormode & Muthukrishnan, J. Algorithms 2005). A CMS is
a depth×width counter grid; each key increments one counter per row
(row-specific hash), and the estimate is the MIN over its counters —
always ≥ the true count (collisions only inflate), with error ≤
N·e/width at 1−(1/e)^depth confidence. Counter grids ADD: per-partition
or per-micro-batch sketches merge by element-wise sum, which is what
makes the operator shuffle-friendly (d·w-row state, however large the
stream).

Hashing is the engine-portable congruential family used by
textops.sampling / graph.wl — exact int64 arithmetic, no engine hash
functions — so the whole sketch (build AND probe) is replayable in
portable SQL, which is how the driver oracle pins it. Keys are integers
by contract; hash a string key to int64 upstream if needed (any
engine-portable scheme), or widen DEPTH_SEEDS for more rows.

Scale shape: build = one explode to depth rows per input + one
groupBy(row, slot) with map-side partial counts (the grid is the ONLY
shuffled state — d·w rows); probe = the same hash expressions on the
key set + a broadcast join against the grid + a d-row min per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate", "CMS_P", "DEPTH_SEEDS"]

CMS_P = 2_147_483_647  # 2^31 - 1: (key % P) * a stays < 2^62
DEPTH_SEEDS: list[tuple[int, int]] = [
    (1_103_515_245, 12_345),
    (1_103_515_243, 54_321),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
]


def _slot(key: Column, a: int, b: int, width: int) -> Column:
    return ((key % CMS_P) * F.lit(a) + F.lit(b)) % F.lit(CMS_P) % F.lit(width)


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """One (row, slot, c) counter grid over the occurrences of
    ``key_col`` (one increment per input ROW — pre-aggregate upstream to
    sketch weighted counts). Grids built over disjoint slices of the
    same stream merge with ``groupBy(row, slot).sum(c)``."""
    if not 1 <= depth <= len(DEPTH_SEEDS):
        raise ValueError(f"depth must be in [1, {len(DEPTH_SEEDS)}]")
    k = F.col(key_col).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _slot(k, a, b, width).alias("slot"),
            )
            for i, (a, b) in enumerate(DEPTH_SEEDS[:depth])
        ]
    )
    return (
        df.select(F.explode(rows).alias("h"))
        .groupBy(F.col("h.row").alias("row"), F.col("h.slot").alias("slot"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """(key_col, est): the CMS point estimate min_i grid[i][h_i(key)]
    for every row of ``keys``. ``width``/``depth`` MUST match the build.
    A key whose counters were never touched estimates 0 via the grid's
    missing slots (treated as empty ⇒ the min is 0)."""
    k = F.col(key_col).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _slot(k, a, b, width).alias("slot"),
            )
            for i, (a, b) in enumerate(DEPTH_SEEDS[:depth])
        ]
    )
    kh = keys.select(key_col, F.explode(rows).alias("h")).select(
        key_col, F.col("h.row").alias("row"), F.col("h.slot").alias("slot")
    )
    return (
        kh.join(F.broadcast(counters), ["row", "slot"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
