"""Composed export pipelines — the reference's top-level dataset jobs.

Two end-to-end compositions mirroring SURVEY.md §3.2/§3.3 downstream
entry points:

* :func:`build_pair_dataset` — the raw-dump→training-pairs conversion
  (apps/utils/embedder/convert-raw-embedder-dump-to-dataset.py:29-232):
  sentence split both texts (T8), within-row sentence cross product
  (B5), score from relation weight, seeded train/test split (B4),
  test-priority dedup + min-length filter (J7/P5).
* :func:`export_relgat_triplets` — the RelGAT graph-dataset export
  (plwordnet_ml/.../relgat.py:85-293 + aligned_dataset_id.py:365-430):
  keep edges whose BOTH endpoints have embeddings (J5 double semi
  join), assign dense 0-based relation ids sorted by name (O1+W3), emit
  (src, dst, rel_idx) triplets plus the id↔name mapping dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plwordnet_spark.datasets.split import (
    priority_dedup,
    sentence_pair_explode,
    train_test_split,
)

__all__ = ["build_pair_dataset", "export_relgat_triplets"]


def build_pair_dataset(
    samples: DataFrame,
    train_ratio: float = 0.93,
    seed: int = 42,
    min_text_len: int = 25,
) -> DataFrame:
    """samples(text_parent, text_child, relation_weight, …) →
    pairs(sentence1, sentence2, score, split), deduplicated with test
    priority (a train pair whose key appears in test is dropped)."""
    pairs = sentence_pair_explode(samples).select(
        "sentence1", "sentence2", F.col("relation_weight").alias("score")
    )
    pairs = train_test_split(pairs, ["sentence1", "sentence2"], train_ratio, seed)
    train = pairs.filter(F.col("split") == "train")
    test = pairs.filter(F.col("split") == "test")
    train = priority_dedup(
        train, test, ["sentence1", "sentence2"],
        min_text_len=min_text_len, text_cols=["sentence1", "sentence2"],
    )
    test = test.filter(
        (F.length("sentence1") >= min_text_len) & (F.length("sentence2") >= min_text_len)
    )
    return train.unionByName(test).dropDuplicates(["sentence1", "sentence2", "split"])


def export_relgat_triplets(
    edges: DataFrame,
    rel_names: DataFrame,
    node_embeddings: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """→ (triplets(src, dst, rel_idx), mapping(rel_id, name, rel_idx)).

    ``edges(src, dst, rel_id)``; ``rel_names(rel_id, name)`` small dim;
    ``node_embeddings(id, …)`` — existence filter only (relgat.py:359-363
    keeps relations with both endpoint embeddings present).
    """
    emb_ids = node_embeddings.select("id").distinct()
    filtered = (
        edges.join(emb_ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(emb_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    # dense ids over the rel-name dim, sorted by name (relgat.py:209 sorts
    # found names before assignment); the dim is tiny — single-partition
    # window is fine and deterministic
    used = filtered.select("rel_id").distinct()
    mapping = (
        rel_names.join(used, "rel_id", "left_semi")
        .withColumn(
            "rel_idx",
            F.row_number().over(Window.orderBy("name", "rel_id")) - 1,
        )
    )
    triplets = filtered.join(F.broadcast(mapping.select("rel_id", "rel_idx")), "rel_id").select(
        "src", "dst", "rel_idx"
    )
    return triplets, mapping
