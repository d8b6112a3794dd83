"""Train/test splitting, priority dedup, sentence-pair explosion.

Reference semantics (SURVEY.md §2.9):

* B4 train/test split (convert-raw-embedder-dump-to-dataset.py:205-222):
  seeded shuffle + ratio slice → here a *hash split* on a stable key,
  which is deterministic, partition-count invariant, and needs no global
  sort (the distributed improvement over seeded-shuffle-slice),
* J7 priority dedup (embedder-dataset-dedupliactor.py:55-96): a train
  pair already present in test is dropped (test has priority), composed
  with the min-length-25 filter (:98-145),
* B5 sentence-pair explosion (convert-raw…py:60-82): both texts split to
  sentences, cross product per row via two explodes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_test_split",
    "priority_dedup",
    "sentence_pair_explode",
    "make_splitter_udf",
]

_SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+"


def make_splitter_udf(splitter: Callable[[str], list[str]]):
    """Wrap a ``text -> list[sentence]`` callable (e.g. a spaCy pipeline's
    sentencizer, reference lexical_unit.py:333-403) as an Arrow-batched
    pandas UDF — the injection seam for model-based sentence splitting.
    The callable rides the UDF closure; heavy models should lazy-load on
    first call and cache in a module global (see
    vectors.hash_embed.make_encoder_udf for the pattern)."""

    @F.pandas_udf("array<string>")
    def split_sentences(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.fillna("").astype(str).map(lambda t: list(splitter(t)))

    return split_sentences


def train_test_split(
    df: DataFrame,
    key_cols: list[str],
    train_ratio: float = 0.93,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic hash split: same key → same side, any partitioning."""
    bucket = F.pmod(F.xxhash64(*key_cols, F.lit(seed)), F.lit(10_000))
    return df.withColumn(
        split_col,
        F.when(bucket < F.lit(int(train_ratio * 10_000)), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def priority_dedup(
    train: DataFrame,
    test: DataFrame,
    key_cols: list[str],
    min_text_len: int | None = 25,
    text_cols: list[str] | None = None,
) -> DataFrame:
    """Drop train rows whose key appears in test; optionally enforce the
    min-length filter on the given text columns (dedupliactor rules)."""
    out = train.join(test.select(*key_cols).distinct(), key_cols, "left_anti")
    if min_text_len and text_cols:
        for col in text_cols:
            out = out.filter(F.length(F.col(col)) >= F.lit(min_text_len))
    return out


def sentence_pair_explode(
    df: DataFrame,
    col1: str = "text_parent",
    col2: str = "text_child",
    out1: str = "sentence1",
    out2: str = "sentence2",
    splitter: Callable[[str], list[str]] | None = None,
) -> DataFrame:
    """Each row → cross product of its two texts' sentences (two explodes
    = within-row cartesian, B5). Default splitting is the deterministic
    JVM regex (SURVEY.md §2.3 T8); pass ``splitter`` (text → sentences,
    e.g. a spaCy sentencizer, reference lexical_unit.py:333-403) to route
    both columns through an Arrow-batched pandas UDF instead."""
    if splitter is None:
        def split_col(c: str) -> Column:
            return F.split(F.col(c), _SENTENCE_SPLIT_RE)
    else:
        split_udf = make_splitter_udf(splitter)

        def split_col(c: str) -> Column:
            return split_udf(F.col(c))
    return (
        df.withColumn("_s1", split_col(col1))
        .withColumn("_s2", split_col(col2))
        .withColumn(out1, F.explode("_s1"))
        .withColumn(out2, F.explode("_s2"))
        .filter((F.length(out1) > 0) & (F.length(out2) > 0))
        .drop("_s1", "_s2")
    )
