"""Per-partition CSR adjacency blocks for iterative gather-scatter.

The north-star optimization (SURVEY.md §4.2 #3): instead of joining the
edge table to the rank vector every iteration (shipping the edges
through a shuffle each time), the adjacency is staged ONCE to disk,
hash-bucketed by ``pmod(xxhash64(src), P)``, and each Python worker
lazily loads its bucket into a compact numpy CSR-like block (sorted src
ids, per-edge dst + scatter share, prefix offsets) cached in the worker
process (Spark reuses Python workers: ``spark.python.worker.reuse``).

Per iteration the only data crossing the JVM↔Python boundary is the
rank vector for the bucket's sources (grouped ``applyInPandas``); the
gather multiply and the per-destination partial sums happen in numpy
(the map-side combine), then a single JVM ``groupBy(dst).sum`` finishes
the reduction.

Scale notes: bucket count P should track cluster parallelism; each
bucket's CSR block must fit a worker's memory (P scales it down
linearly). Worker cache misses (new worker, evicted bucket) are
self-healing — the block is re-read from the bucketed parquet.

No scipy in this container; the "CSR" is plain numpy arrays (sorted-run
offsets), functionally equivalent for the gather.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CsrAdjacency"]

# worker-process-global cache: (adj_dir, stage_token, bucket) → CSR block.
# The token changes on every stage() — re-staging a different edge table
# into the same directory invalidates reused workers' cached blocks, and
# inserting under a new token evicts the directory's stale entries so
# worker memory stays bounded across repeated runs.
_CSR_CACHE: dict = {}


def _cache_put(adj_dir: str, token: str, bucket: int, block) -> None:
    # evict (a) same-directory entries under a stale token and (b) entries
    # whose staged directory is gone (pagerank's default path stages into a
    # fresh mkdtemp per call and rmtree's it afterwards — without (b) those
    # blocks would accumulate in reused workers forever)
    stale = [
        k for k in _CSR_CACHE
        if (k[0] == adj_dir and k[1] != token)
        or (k[0] != adj_dir and not os.path.isdir(k[0]))
    ]
    for k in stale:
        del _CSR_CACHE[k]
    _CSR_CACHE[(adj_dir, token, bucket)] = block


def _load_block(adj_dir: str, bucket: int):
    """Read one bucket's edges from parquet into a CSR-ish block."""
    import pyarrow.parquet as pq

    path = os.path.join(adj_dir, f"part={bucket}")
    if not os.path.isdir(path):
        return None
    tables = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            tables.append(pq.read_table(os.path.join(path, name)))
    if not tables:
        return None
    import pyarrow as pa

    table = pa.concat_tables(tables)
    src = table.column("src").to_numpy(zero_copy_only=False)
    dst = table.column("dst").to_numpy(zero_copy_only=False)
    share = table.column("share").to_numpy(zero_copy_only=False)
    order = np.argsort(src, kind="stable")
    src, dst, share = src[order], dst[order], share[order]
    # run-length offsets over sorted src ids (the CSR indptr analog)
    unique_src, start_idx = np.unique(src, return_index=True)
    offsets = np.append(start_idx, len(src))
    # dst ids factorized ONCE at load: the per-iteration in-bucket
    # combine is then a single bincount over small integer codes
    # instead of a pandas hash-groupby over raw 64-bit ids per call
    unique_dst, dst_codes = np.unique(dst, return_inverse=True)
    return {
        "unique_src": unique_src,
        "offsets": offsets,
        "share": share,
        "unique_dst": unique_dst,
        "dst_codes": dst_codes,
    }


class CsrAdjacency:
    """Disk-staged, worker-cached CSR adjacency for one edge table."""

    def __init__(self, spark: SparkSession, workdir: str, n_buckets: int):
        self.spark = spark
        self.adj_dir = os.path.join(workdir, "csr_adjacency")
        self.n_buckets = n_buckets
        # resume path: a previously staged directory carries its token
        self.token = self._read_token()

    @property
    def _token_path(self) -> str:
        return os.path.join(self.adj_dir, "_stage_token")

    def _read_token(self) -> str | None:
        try:
            with open(self._token_path, encoding="utf-8") as fh:
                return fh.read().strip()
        except OSError:
            return None

    def stage(self, edges_with_share: DataFrame) -> None:
        """One-time write: edges(src, dst, share) → parquet bucketed by
        pmod(xxhash64(src), P). This is the only pass over the edges."""
        (
            edges_with_share.withColumn(
                "part", F.pmod(F.xxhash64("src"), F.lit(self.n_buckets)).cast("int")
            )
            .repartition("part")
            .write.mode("overwrite")
            .partitionBy("part")
            .parquet(self.adj_dir)
        )
        self.token = uuid.uuid4().hex
        with open(self._token_path, "w", encoding="utf-8") as fh:
            fh.write(self.token)

    def bucket_col(self, id_col):
        """The same bucketing expression for the rank side — identical
        hash → ranks arrive at the bucket holding their out-edges."""
        return F.pmod(F.xxhash64(id_col), F.lit(self.n_buckets)).cast("int")

    def gather(self, ranks_with_part: DataFrame) -> DataFrame:
        """ranks(part, id, rank) → partial contributions (dst, partial):
        per-bucket numpy gather + in-bucket dst partial sums."""
        if self.token is None:
            raise RuntimeError("CsrAdjacency.gather before stage(): no stage token")
        adj_dir, token = self.adj_dir, self.token

        def _gather(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"dst": [], "partial": []}).astype(
                    {"dst": "int64", "partial": "float64"}
                )
            bucket = int(pdf["part"].iloc[0])
            key = (adj_dir, token, bucket)
            block = _CSR_CACHE.get(key)
            if block is None:
                block = _load_block(adj_dir, bucket)
                _cache_put(adj_dir, token, bucket, block if block is not None else "empty")
            if block in (None, "empty"):
                return pd.DataFrame({"dst": [], "partial": []}).astype(
                    {"dst": "int64", "partial": "float64"}
                )
            ids = pdf["id"].to_numpy()
            rank = pdf["rank"].to_numpy()
            # align incoming ranks to the block's sorted source ids
            pos = np.searchsorted(block["unique_src"], ids)
            valid = (pos < len(block["unique_src"])) & (
                block["unique_src"][np.minimum(pos, len(block["unique_src"]) - 1)] == ids
            )
            rank_of_src = np.zeros(len(block["unique_src"]), dtype=np.float64)
            rank_of_src[pos[valid]] = rank[valid]
            # expand per-source rank to per-edge via run lengths
            counts = np.diff(block["offsets"])
            per_edge_rank = np.repeat(rank_of_src, counts)
            contrib = per_edge_rank * block["share"]
            # in-bucket combine: one bincount over the pre-factorized dst
            # codes sums per dst before the JVM shuffle (O(E) adds, no
            # per-call hash-groupby machinery)
            partial = np.bincount(
                block["dst_codes"], weights=contrib,
                minlength=len(block["unique_dst"]),
            )
            return pd.DataFrame(
                {"dst": block["unique_dst"], "partial": partial}
            )

        return (
            ranks_with_part.groupBy("part")
            .applyInPandas(_gather, schema="dst long, partial double")
            .groupBy("dst")
            .agg(F.sum("partial").alias("incoming"))
        )
