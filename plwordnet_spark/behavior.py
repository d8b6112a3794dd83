"""Behavioral sequence analytics over event streams — funnels, Markov
transition matrices, and top navigation paths.

A web-scale corpus engine ingests not just pages but interaction logs
(the `events` table: user_id, ts, event_type). The reference models
user-facing flows imperatively (plwordnet_handler session accounting);
at 10^12-event scale every one of these must be a shuffle-by-user
DataFrame job:

- ``funnel``: ordered-step conversion counts. Each step k is one
  filtered aggregate joined to step k-1's per-user first-completion
  time on the user key — K small hash joins, all co-partitioned on
  ``user_col`` so AQE collapses them into one shuffle lineage. No
  window over the full stream is needed; cost is O(K) scans of the
  (predicate-pushed) event subset.
- ``markov_transitions``: lag-1 window per user ordered by (ts, id)
  → pair counts → per-source normalization. One shuffle on user for
  the window, one tiny agg on (prev, cur); the transition matrix is
  |types|² rows regardless of input scale.
- ``top_paths``: lag-2 trigram extraction with the same single
  user-partitioned window, then a global top-N on the tiny
  path-histogram — the N·log(N) sort runs over at most |types|³ rows.

All three keep per-user state inside one window partition: no
cross-user dependency, so the plan scales linearly with users and is
immune to event-count skew between users (a power user's events stay
in one partition but windows stream them without materializing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["funnel", "markov_transitions", "top_paths", "cooccurrence_lift"]


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: how many users completed step 1, then step 2
    strictly after their first step-1 event, and so on.

    Returns (step:int, step_name:string, users:bigint) — one row per
    step, built lazily (no driver-side counts): each step's user set
    is an aggregate DataFrame and the result is a union of single-row
    counts, so the whole funnel is one Spark job.

    Step semantics: a user completes step k at the EARLIEST event of
    type ``steps[k]`` that is strictly later than their step-(k-1)
    completion time (first-touch attribution, the standard product-
    analytics definition).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    rows = [
        reached.agg(
            F.lit(1).alias("step"),
            F.lit(steps[0]).alias("step_name"),
            F.count(F.lit(1)).alias("users"),
        )
    ]
    for k, name in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == name).select(
            F.col(user_col), F.col(ts_col).alias("_nt")
        )
        reached = (
            nxt.join(reached.select(user_col, "_t"), user_col)
            .filter(F.col("_nt") > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min("_nt").alias("_t"))
        )
        rows.append(
            reached.agg(
                F.lit(k).alias("step"),
                F.lit(name).alias("step_name"),
                F.count(F.lit(1)).alias("users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def markov_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream: (prev_type, event_type, n, prob) where prob is the
    row-normalized transition probability out of ``prev_type``.

    Ordering ties are broken by ``id_col`` so the lag sequence — and
    therefore the matrix — is deterministic under any partitioning.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("prev_type"), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        type_col,
        "n",
        F.round(F.col("n") / F.sum("n").over(total), round_to).alias("prob"),
    )


def top_paths(
    events: DataFrame,
    *,
    length: int = 3,
    n: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-N most frequent length-``length`` event-type paths across
    all user streams: (path:string, n_occurrences).

    The path histogram has at most |types|^length rows, so the global
    ordering (count desc, path asc for determinism) is a sort over a
    tiny aggregate, not over the event stream.
    """
    if length < 2:
        raise ValueError("path length must be >= 2")
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    cols = [F.col(type_col)]
    df = events
    for i in range(1, length):
        df = df.withColumn(f"_lag{i}", F.lag(type_col, i).over(w))
        cols.insert(0, F.col(f"_lag{i}"))
    df = df.filter(F.col(f"_lag{length - 1}").isNotNull())
    return (
        df.select(F.concat_ws(" > ", *cols).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(n)
    )


def cooccurrence_lift(
    baskets: DataFrame,
    *,
    group_col: str = "basket_id",
    item_col: str = "item",
    min_pairs: int = 2,
    max_basket_size: int = 200,
) -> DataFrame:
    """Market-basket co-occurrence with lift (association-rule mining's
    support/lift core, Agrawal–Srikant 1994 flavored for DataFrames).

    For every unordered item pair (a < b): ``n_ab`` = baskets holding
    both, ``lift`` = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) with N =
    total baskets. Lift > 1 ⇒ the items attract; < 1 ⇒ repel. On a
    link-graph payload the same shape mines domains co-linked by the
    same page or products co-ordered.

    Scale shape: the pair generator is a self-join WITHIN basket, so
    cost is Σ|basket|² — quadratic in basket size, linear in baskets.
    ``max_basket_size`` drops pathological mega-baskets (the exact
    hub-cap contract linkpred/cocitation use: named, bounded, and
    reported by the caller's diff if it matters). ``min_pairs`` floors
    support so the output is the interesting head, not |items|² noise.

    Returns (item_a, item_b, n_ab, lift) — lift as a raw double; round
    at the presentation edge.
    """
    items = baskets.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("it")
    ).distinct()
    sizes = items.groupBy("g").agg(F.count(F.lit(1)).alias("bsz"))
    items = items.join(
        sizes.filter(F.col("bsz") <= max_basket_size).select("g"), "g", "left_semi"
    )
    n_total = items.select("g").distinct().count()
    item_n = items.groupBy("it").agg(F.count(F.lit(1)).alias("n_item"))
    a = items.select("g", F.col("it").alias("item_a"))
    b = items.select("g", F.col("it").alias("item_b"))
    pairs = (
        a.join(b, "g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    na = item_n.select(F.col("it").alias("item_a"), F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("it").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            (F.col("n_ab") * F.lit(n_total) / (F.col("n_a") * F.col("n_b"))).alias(
                "lift"
            ),
        )
    )
