"""Vector pooling aggregations — node-embedding strategies.

Reference: EmbeddingsStrategy mean / weighted-mean pooling
(plwordnet_ml/embedder/strategy.py:21-99; weights normalized to sum 1,
optional L2 output normalization; weight = 1 + n_examples smoothing at
synset.py:150-183).

Implementation: ``posexplode`` the vector column and aggregate per
(group, dimension) — pure JVM aggregation with map-side combine, scales
to arbitrary group sizes (no collect_list buffering), then reassemble
ordered arrays with ``array_agg`` sorted by position. Everything stays
in whole-stage codegen; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mean_pool", "weighted_mean_pool", "l2_normalize_expr", "impute_missing_by_group"]


def l2_normalize_expr(vec_col):
    """array<double> → unit-norm array (JVM higher-order functions)."""
    norm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(norm > 0, F.transform(vec_col, lambda x: x / norm)).otherwise(vec_col)


def _assemble(df: DataFrame, group_cols: list[str], value_col: str, out_col: str) -> DataFrame:
    """(group, pos, value) → (group, array ordered by pos)."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col(value_col).alias("v")))
            ).alias("_pairs")
        )
        .select(
            *group_cols,
            F.transform(F.col("_pairs"), lambda p: p["v"]).alias(out_col),
        )
    )


def mean_pool(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    out_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Element-wise mean of all vectors per group (strategy.py:79-83)."""
    exploded = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    pooled = exploded.groupBy(*group_cols, "pos").agg(F.avg("x").alias("x"))
    out = _assemble(pooled, group_cols, "x", out_col)
    if normalize:
        out = out.withColumn(out_col, l2_normalize_expr(F.col(out_col)))
    return out


def impute_missing_by_group(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
) -> DataFrame:
    """Fill null vectors with the mean of their group's non-null vectors
    (the reference's empty-LU imputation,
    plwordnet_ml/.../lexical_unit_empty.py:110-182). Rows in groups with
    no vectors at all keep null."""
    present = df.filter(F.col(vec_col).isNotNull())
    group_means = mean_pool(present, group_cols, vec_col=vec_col, out_col="_group_mean")
    return (
        df.join(group_means, group_cols, "left")
        .withColumn(vec_col, F.coalesce(F.col(vec_col), F.col("_group_mean")))
        .drop("_group_mean")
    )


def weighted_mean_pool(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    weight_col: str = "weight",
    out_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """sum(w·x)/sum(w) per dimension — weights effectively normalized to
    sum 1 per group (strategy.py:70-98)."""
    exploded = df.select(
        *group_cols,
        F.col(weight_col).alias("_w"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    pooled = exploded.groupBy(*group_cols, "pos").agg(
        (F.sum(F.col("x") * F.col("_w")) / F.sum("_w")).alias("x")
    )
    out = _assemble(pooled, group_cols, "x", out_col)
    if normalize:
        out = out.withColumn(out_col, l2_normalize_expr(F.col(out_col)))
    return out
