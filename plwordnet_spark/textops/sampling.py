"""Deterministic stratified sampling — training-data mixture construction.

Web-scale corpora are mixed by *source strata* (language, domain,
quality band): each stratum gets a keep-rate so the training mixture
hits target proportions (the reference's balanced relation-split,
datasets/balanced.py, solves the same problem for relation pairs with
per-class caps; this is the corpus-level generalization a webtext
pipeline needs).

Sampling must be DETERMINISTIC and ENGINE-PORTABLE: a resumed or
re-run job has to keep exactly the same rows, and the decision must
not depend on partitioning (``F.rand`` fails both). The keep decision
is the same mod-P congruential used by :mod:`plwordnet_spark.graph.walks`
and :mod:`plwordnet_spark.graph.mis`:

    keep(id)  iff  ((id mod P)·A + B + seed) mod P  <  floor(rate·P)

Exact int64 arithmetic throughout — (P−1)·A < 2^61 — so any engine
(the DuckDB oracle included) replays the identical sample. The hash
input is the row's stable id, so the sample is a property of the DATA,
not of the plan: repartition, AQE re-plans, or a different executor
count cannot change membership.

Scale shape: a single codegen'd filter over the scan — no shuffle, no
state; predicate pushdown still applies to any other filters stacked
on top. At 100 TB this is the cheapest possible operator.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "stratified_sample",
    "sample_per_stratum",
    "weighted_sample_per_stratum",
    "mixture_weights",
    "sample_hash",
    "SAMPLE_P",
    "SAMPLE_A",
    "SAMPLE_B",
]

SAMPLE_P = 2_147_483_647  # 2^31 − 1 (Mersenne prime)
SAMPLE_A = 1_103_515_245  # glibc LCG multiplier
SAMPLE_B = 12_345


def sample_hash(id_col: Column | str, seed: int = 0) -> Column:
    """The portable per-row draw in [0, P): exact integer arithmetic,
    reproducible in any engine from the row id alone."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c % SAMPLE_P) * F.lit(SAMPLE_A) + F.lit(SAMPLE_B + seed)) % SAMPLE_P


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    *,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    default_rate: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep-rate in [0, 1]; strata not
    listed use ``default_rate``. Thresholds are fixed to integers
    (``floor(rate·P)``) on the driver so both this plan and any SQL
    oracle compare against the identical int64 literal.

    Returns ``df`` filtered — schema unchanged, no shuffle.
    """

    def _threshold(rate: float) -> int:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate {rate!r} outside [0, 1]")
        return int(rate * SAMPLE_P)

    thresh: Column = F.lit(_threshold(default_rate))
    for value in sorted(rates):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold(rates[value]))
        ).otherwise(thresh)
    return df.filter(sample_hash(id_col, seed) < thresh)


def sample_per_stratum(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    seed: int = 0,
) -> DataFrame:
    """Exactly (up to) ``k`` rows PER STRATUM, deterministically.

    Rate-based sampling (:func:`stratified_sample`) yields binomial
    strata sizes; eval-set carving and per-source quota fills need a
    FIXED count. Rows are ranked inside each stratum by the portable
    congruential draw (ties broken by id — a total order), and the k
    smallest win: the same rows on any engine, any partitioning, any
    prefix of the data that contains them.

    One shuffle on ``strata_col``; the rank window prunes in-shuffle
    (WindowGroupLimit pushes the k-filter into the sort), so a 100 TB
    stratum never materializes fully sorted.
    """
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rn = F.row_number().over(
        W.partitionBy(strata_col).orderBy(sample_hash(id_col, seed), F.col(id_col))
    )
    return df.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")


def weighted_sample_per_stratum(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per stratum,
    deterministic and engine-portable (Efraimidis-Spirtes A-ES).

    Each row gets the key ln(u) / w with u in (0, 1] derived from the
    portable congruential draw and w = its weight; the k LARGEST keys
    per stratum form an exact weighted sample without replacement
    (Efraimidis & Spirtes 2006, "Weighted random sampling with a
    reservoir" — the one-pass reservoir scheme; here the reservoir
    becomes a rank window). Quality-weighted corpus subsampling at
    100 TB is this exact operator: weight = quality score, stratum =
    language/source.

    Same scale shape as :func:`sample_per_stratum` — one shuffle on
    the stratum, in-shuffle WindowGroupLimit prune, membership a pure
    function of (id, weight, seed): partitioning-, engine- and
    resume-invariant. Rows with weight <= 0 or NULL are excluded (they
    have probability 0 in the A-ES scheme).
    """
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (sample_hash(id_col, seed) + 1).cast("double") / F.lit(
        float(SAMPLE_P + 1)
    )
    key = F.log(u) / F.col(weight_col).cast("double")
    rn = F.row_number().over(
        W.partitionBy(strata_col).orderBy(F.desc(key), F.col(id_col))
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_weights(
    docs: DataFrame,
    *,
    by: str = "source",
    alpha: float = 0.3,
    budget: int = 10_000,
) -> DataFrame:
    """Temperature-scaled sampling weights per stratum — the mixing
    recipe multilingual / multi-source training corpora are drawn with
    (mC4 / XLM-R style: w_s ∝ n_s^alpha with alpha < 1, which
    up-weights tail strata relative to their raw share so the head
    sources don't drown them; alpha = 1 is proportional, alpha = 0 is
    uniform).

    Returns one row per stratum: ``(by, n_docs, weight, expected_docs,
    repeat_factor)`` where ``weight = n_s^alpha / Σ n_t^alpha``,
    ``expected_docs = floor(weight · budget)`` and ``repeat_factor`` is
    expected_docs-per-available-doc (> 1 means that stratum would be
    repeated / multi-epoched at this budget — the early-warning signal
    for upsampling-induced duplication).

    Feeds :func:`stratified_sample` directly: ``rates = {s:
    min(1.0, weight·budget / n_s)}``. Scale shape: one histogram-sized
    groupBy (map-side partials) + a scalar broadcast — nothing here
    touches row-level data twice.
    """
    counts = docs.groupBy(by).agg(F.count(F.lit(1)).alias("n_docs"))
    powed = counts.withColumn(
        "p", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    )
    tot = powed.agg(F.sum("p").alias("tp"))
    share = F.col("p") / F.col("tp")
    return powed.crossJoin(F.broadcast(tot)).select(
        by,
        "n_docs",
        F.round(share, 6).alias("weight"),
        # floor over the ROUNDED weight: the raw share is an engine-
        # dependent double quotient, and floor(share·budget) flips on a
        # 1-ULP difference whenever the product lands on an integer
        # (e.g. perfectly balanced strata); rounding first makes the
        # multiply IEEE-identical across engines
        F.floor(F.round(share, 6) * F.lit(budget))
        .cast("long")
        .alias("expected_docs"),
        F.round(share * F.lit(budget) / F.col("n_docs"), 6).alias(
            "repeat_factor"
        ),
    )
