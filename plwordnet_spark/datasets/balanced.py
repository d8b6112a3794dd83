"""Weight-balanced positive/negative dataset construction.

Distributed re-expression of the reference's embedder-dataset balancing
(SURVEY.md §2.9): threshold partition (B1, embedder.py:888-897),
negative-sample synthesis by pairing a shuffled pool with anti-join
dedup against positives in both orientations (B2, embedder.py:711-788),
and the driver-side ratio arithmetic on two counted scalars (B3,
embedder.py:850-930).

Scale notes: the reference shuffles a Python list and zips neighbors —
a global order. Here the pool is hash-bucketed and pairing happens
within buckets via a window ``lead()``; with a fixed bucket count the
result is deterministic, partition-invariant, and needs no global sort
(each bucket's window sorts locally).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["weight_partition", "balance_arithmetic", "negative_synthesis"]

NEGATIVE_WEIGHT = 0.005  # reference default for synthesized negatives


def weight_partition(samples: DataFrame, cut_weight: float = 0.14, weight_col: str = "relation_weight"):
    """(low, high) split at ``cut_weight`` (reference cut_weight=0.14,
    wrappers.py:54; default 0.5 embedder.py:623)."""
    low = samples.filter(F.col(weight_col) < F.lit(cut_weight))
    high = samples.filter(F.col(weight_col) >= F.lit(cut_weight))
    return low, high


def balance_arithmetic(low_count: int, high_count: int, ratio: float = 2.0) -> dict:
    """Driver-side scalar math of embedder.py:850-930: how many negative
    examples to add so low:high respects ``ratio``. Raises when the low
    side already exceeds ratio·high (mirrors the reference's error)."""
    if low_count > high_count * ratio:
        raise ValueError(
            f"low count {low_count} exceeds {ratio}×high count {high_count}"
        )
    if low_count == 0:
        # reference embedder.py:908-909 substitutes l_count = 1 before the
        # formula rather than special-casing the result
        low_count = 1
    # verbatim reference arithmetic (embedder.py:911-913) INCLUDING the
    # low*(high/low) float detour: when the division lands one ulp below
    # the integer, truncating int() lands a whole unit lower than the
    # algebraically-equal int(ratio*high + 1) — e.g. (7, 61, 2.0) → 115,
    # not 116. Exact parity beats the cleaner formula here.
    add_examples = (
        int(ratio * (low_count * (high_count / low_count)) + 1) - low_count
    )
    l_h_ratio = round(0.5 + add_examples / low_count)
    return {"add_examples": add_examples, "l_h_ratio": l_h_ratio}


def negative_synthesis(
    pool: DataFrame,
    positives: DataFrame,
    seed: int = 42,
    max_count: int | None = None,
    n_buckets: int = 64,
    text_parent_col: str = "text_parent",
    text_child_col: str = "text_child",
    weight: float = NEGATIVE_WEIGHT,
) -> DataFrame:
    """Pair up a deterministically-shuffled pool into negative samples.

    ``pool``: candidate rows with at least (text_parent_col); each row
    contributes one text. ``positives``: existing positive samples with
    (text_parent_col, text_child_col) — any synthesized pair matching a
    positive in either orientation is dropped (anti-dedup J6,
    embedder.py:773-781).
    """
    shuffled = pool.select(F.col(text_parent_col).alias("text")).withColumn(
        "h", F.xxhash64("text", F.lit(seed))
    )
    shuffled = shuffled.withColumn(
        "bucket", F.pmod(F.col("h"), F.lit(n_buckets)).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy("h", "text")
    paired = (
        shuffled.withColumn("rn", F.row_number().over(w))
        .withColumn("next_text", F.lead("text").over(w))
        .filter((F.col("rn") % 2 == 1) & F.col("next_text").isNotNull())
        .select(
            F.col("text").alias(text_parent_col),
            F.col("next_text").alias(text_child_col),
            F.col("h"),
        )
        .filter(F.col(text_parent_col) != F.col(text_child_col))
    )
    pos_keys = positives.select(text_parent_col, text_child_col).distinct()
    pos_both = pos_keys.unionByName(
        pos_keys.select(
            F.col(text_child_col).alias(text_parent_col),
            F.col(text_parent_col).alias(text_child_col),
        )
    ).distinct()
    negatives = paired.join(pos_both, [text_parent_col, text_child_col], "left_anti")
    negatives = negatives.withColumn("relation_weight", F.lit(weight)).withColumn(
        "relation_name", F.lit("synthetic_negative")
    )
    if max_count is not None:
        # deterministic cap: order by the seeded shuffle hash before the
        # limit — which negatives survive is a pure function of (data,
        # seed), not of partition scheduling (reference semantics: a cap
        # over a seeded-shuffled list, embedder.py:709)
        negatives = negatives.orderBy("h", text_parent_col).limit(max_count)
    return negatives.drop("h")
