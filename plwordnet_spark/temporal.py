"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Two classic event-table operators (quote/trade alignment, attribution
windows, slowly-changing-dimension lookups) expressed Spark-first —
no UDFs, no nested-loop joins:

* :func:`asof_join` — for each left row, the single right row with the
  greatest (backward) / least (forward) timestamp at-or-before /
  at-or-after the left row's, per key. Implemented as the tagged-union
  + last-non-null-over-window pattern: ONE shuffle on the key, one
  in-partition sort, then a streaming window pass — per-row state is
  O(1), so a key's whole history never materializes in memory. The
  naive alternative (join on key + temporal inequality + argmax) is a
  quadratic-per-key join; Spark would plan the inequality as a
  nested-loop.
* :func:`range_join_bins` — point-in-interval join binned into an
  equi-join: intervals explode onto the fixed-width bin grid they
  overlap, points map to their single bin, the pair meets in that bin
  with an exact containment filter behind it. A point's (point,
  interval) pair exists in exactly one bin, so no dedup is needed.
  Without the trick, Spark plans `lo <= p AND p < hi` as a
  BroadcastNestedLoopJoin — O(|points|·|intervals|) and
  driver-bounded; with it, a plain shuffled hash join.

Both are deterministic and SQL-replayable: the driver oracles use
DuckDB's native ASOF JOIN and a plain inequality join respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "cohort_retention", "range_join_bins"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_r",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the temporally closest
    ``right`` row per ``on`` key (all right columns except the key are
    appended with ``suffix``; unmatched rows keep them NULL).

    ``direction="backward"`` matches the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``);
    ``"forward"`` the earliest with ``right_ts >= left_ts``.
    ``tolerance_sec`` voids matches farther than the tolerance.

    Ties: several right rows sharing (key, timestamp) are broken by the
    LAST one in the union's sort order, which is nondeterministic across
    runs — pre-aggregate the right side to one row per (key, ts) (e.g.
    max event id, as q_asof_join does) when exact determinism matters.

    Scale: one hash shuffle on ``on``; within a key the window is a
    streaming last-non-null, so memory per task is O(1) rows. A single
    mega-key serializes into one task's sort (spillable); range-salt
    the key by coarse time chunk and stitch boundaries if one key owns
    a material share of all events.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts = right_ts or left_ts

    r_payload = [c for c in right.columns if c != on]
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_is_r"),
        *[F.col(c).alias(c + suffix) for c in r_payload],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_r"),
        *[F.col(c) for c in left.columns if c not in (on, left_ts)],
    )
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # sort so the qualifying right rows precede each left row; at equal
    # timestamps the right row sorts first iff the comparison is
    # inclusive (non-strict)
    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    r_ord = F.col("_is_r").desc() if not strict else F.col("_is_r").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(t_ord, r_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        "*",
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias("_m_" + c)
            for c in r_payload
        ],
        F.last(
            F.when(F.col("_is_r") == 1, F.col("_t")), ignorenulls=True
        ).over(w).alias("_m_ts"),
    ).filter(F.col("_is_r") == 0)

    keep_match = F.col("_m_ts").isNotNull()
    if strict:
        # rows with _t == left ts were excluded by sort order only when
        # they sort after the left row; equal-ts right rows must never
        # match under strict comparison
        keep_match = keep_match & (F.col("_m_ts") != F.col("_t"))
    if tolerance_sec is not None:
        gap = F.abs(
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(F.col("_m_ts").cast("timestamp"))
        ) / F.lit(1_000_000.0)
        keep_match = keep_match & (gap <= F.lit(float(tolerance_sec)))

    out_cols = [F.col(on), F.col("_t").alias(left_ts)]
    out_cols += [F.col(c) for c in left.columns if c not in (on, left_ts)]
    out_cols += [
        F.when(keep_match, F.col("_m_" + c)).alias(c + suffix) for c in r_payload
    ]
    return matched.select(*out_cols)


def range_join_bins(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: str | None = None,
    bin_width_sec: float = 3600.0,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner join of point rows to every interval containing them:
    ``lo <= point < hi`` (half-open), optionally also keyed by ``on``.

    All three temporal columns are timestamps. Intervals explode onto
    the ``bin_width_sec`` grid they overlap (pick a width of the same
    order as typical interval length — one-to-a-few bins each);
    ``max_bins_per_interval`` fails fast if a pathological interval
    would explode the grid (a year-long interval on a 1-second grid is
    a bug, not a workload). Column names must be disjoint between the
    two inputs apart from ``on``.
    """
    w_us = int(bin_width_sec * 1_000_000)

    def _us(c: str):
        # parquet event times are commonly TIMESTAMP_NTZ; unix_micros
        # requires TIMESTAMP — the cast applies the same session-tz shift
        # to points and intervals alike, so bin alignment is unaffected
        return F.unix_micros(F.col(c).cast("timestamp"))

    p_bin = (_us(point_col) / w_us).cast("long")
    lo_bin = (_us(lo_col) / w_us).cast("long")
    # half-open: the bin of the last INCLUDED microsecond
    hi_bin = ((_us(hi_col) - 1) / w_us).cast("long")

    guarded = intervals.withColumn("_nb", hi_bin - lo_bin + 1)
    # fail fast, distributedly: any over-wide interval aborts the plan
    guarded = guarded.withColumn(
        "_nb",
        F.when(F.col("_nb") <= max_bins_per_interval, F.col("_nb")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("range_join_bins: interval spans "),
                    F.col("_nb").cast("string"),
                    F.lit(f" bins > max_bins_per_interval={max_bins_per_interval}; "
                          f"raise bin_width_sec"),
                )
            ).cast("long")
        ),
    )
    exploded = guarded.select(
        "*", F.explode(F.sequence(lo_bin, lo_bin + F.col("_nb") - 1)).alias("_bin")
    ).drop("_nb")

    binned_points = points.withColumn("_bin", p_bin)
    keys = ["_bin"] if on is None else [on, "_bin"]
    return (
        binned_points.join(exploded, keys)
        .filter(
            (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort-retention matrix over an event log — the standard web
    analytics rollup: users are assigned to the cohort of their FIRST
    activity period, and each (cohort, offset) cell counts how many of
    them were active ``offset`` periods later.

    Output: (cohort_start timestamp, period_offset int, n_users bigint)
    — one row per non-empty cell, so the result is tiny regardless of
    event volume. ``period``: any ``date_trunc`` unit ('week', 'month',
    'day').

    Scale shape: one groupBy(user, period) distinct-activity pass (the
    big shuffle, map-side combined), a per-user min-window to stamp the
    cohort — expressed as a self-aggregation + broadcast-or-shuffle
    join on user rather than a window so the activity table stays
    partitioned once — then a tiny (cohort, offset) count. No step
    touches raw events twice."""
    active = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc(period, F.col(ts_col)).alias("p"),
        )
        .distinct()
    )
    first = active.groupBy("u").agg(F.min("p").alias("cohort_start"))
    if period == "month":
        # calendar months are uneven; months_between on truncated
        # month starts is exact integers
        offset = F.months_between(F.col("p"), F.col("cohort_start")).cast("int")
    elif period in ("day", "week"):
        unit_days = {"day": 1, "week": 7}[period]
        # date_trunc-aligned periods differ by exact unit multiples
        offset = (
            F.datediff(F.col("p"), F.col("cohort_start")) / unit_days
        ).cast("int")
    else:
        raise ValueError(f"unsupported period {period!r} (day/week/month)")
    return (
        active.join(first, "u")
        .select("cohort_start", offset.alias("period_offset"))
        .groupBy("cohort_start", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
