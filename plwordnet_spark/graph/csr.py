"""Per-partition CSR adjacency blocks for iterative gather-scatter.

The north-star optimization (SURVEY.md §4.2 #3): instead of joining the
edge table to the rank vector every iteration (shipping the edges
through a shuffle each time), the adjacency is staged ONCE, bucketed by
``pmod(xxhash64(src), P)``, and each Python worker lazily loads its
bucket into a compact numpy CSR-like block (sorted src ids, per-edge
dst codes + scatter share, prefix offsets) cached in the worker
process (Spark reuses Python workers: ``spark.python.worker.reuse``).

Round-6 shape (guide §4.2 — vectorized native code; §2.5 — synthetic
partition keys):

* the first worker to load a bucket publishes a pre-processed
  ``.npz`` side file (sorted, factorized, atomic rename) — every
  later cache miss, on any worker, is a plain ``np.load`` instead of
  re-running the sort/unique preprocessing;
* both the staging shuffle and the per-iteration gather are keyed on a
  per-bucket CARRIER value chosen so Spark's Murmur3 puts bucket b
  alone in partition b — P bucket ids hashed raw into P partitions
  land in only ~0.63·P of them (measured 18/32, max load 3);
* the gather is ``mapInArrow``: rank batches arrive as Arrow, the
  result leaves as ONE zero-copy Arrow batch built from the numpy
  output arrays (no pandas construction on either side).

Per iteration the only data crossing the JVM↔Python boundary is the
rank vector for the bucket's sources plus the per-destination partial
sums; a single JVM ``groupBy(dst).sum`` finishes the reduction.

Scale notes: bucket count P should track cluster parallelism; each
bucket's CSR block must fit a worker's memory (P scales it down
linearly). Worker cache misses (new worker, evicted bucket) are
self-healing — the block is re-read from the staged directory, which
must be shared storage on a multi-host cluster (same requirement the
previous parquet staging had). No scipy in this container; the "CSR"
is plain numpy arrays (sorted-run offsets), functionally equivalent
for the gather.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CsrAdjacency"]

# worker-process-global cache: (adj_dir, stage_token, bucket) → CSR block.
# The token changes on every stage() — re-staging a different edge table
# into the same directory invalidates reused workers' cached blocks, and
# inserting under a new token evicts the directory's stale entries so
# worker memory stays bounded across repeated runs.
_CSR_CACHE: dict = {}

_BLOCK_KEYS = ("unique_src", "offsets", "share", "unique_dst", "dst_codes")


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


def _load_block(adj_dir: str, bucket: int, token: str):
    """Load one bucket's CSR block.

    Fast path: a pre-processed ``block_<b>_<token>.npz`` side file
    (plain ``np.load``). Miss path: read the bucket's staged parquet,
    build the block, and publish the npz side file (atomic rename) so
    every LATER cache miss — any worker, any iteration — skips the
    sort/factorize preprocessing. The stage token is part of the file
    name so a re-stage can never serve a stale side file — the default
    STATIC parquet overwrite clears the directory anyway, but a
    session running dynamic partition overwrite would leave loose
    files behind.
    """
    npz_path = os.path.join(adj_dir, f"block_{bucket}_{token}.npz")
    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            return {k: z[k] for k in _BLOCK_KEYS}
    import pyarrow.parquet as pq

    path = os.path.join(adj_dir, f"part={bucket}")
    if not os.path.isdir(path):
        return None
    tables = [
        pq.read_table(os.path.join(path, name))
        for name in sorted(os.listdir(path))
        if name.endswith(".parquet")
    ]
    if not tables:
        return None
    import pyarrow as pa

    table = pa.concat_tables(tables)
    block = _build_block(
        table.column("src").to_numpy(zero_copy_only=False),
        table.column("dst").to_numpy(zero_copy_only=False),
        table.column("share").to_numpy(zero_copy_only=False),
    )
    tmp = f"{npz_path}.tmp-{os.getpid()}-{uuid.uuid4().hex}"
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **block)
        os.replace(tmp, npz_path)
    except OSError:
        pass  # read-only staging dir: every miss rebuilds, still correct
    return block


def _build_block(src: np.ndarray, dst: np.ndarray, share: np.ndarray) -> dict:
    """Sort by src, run-length offsets, factorized dst — the one-time
    preprocessing that used to run on every worker-cache miss."""
    order = np.argsort(src, kind="stable")
    src, dst, share = src[order], dst[order], share[order]
    unique_src, start_idx = np.unique(src, return_index=True)
    offsets = np.append(start_idx, len(src)).astype(np.int64)
    # dst ids factorized ONCE at stage: the per-iteration in-bucket
    # combine is then a single bincount over small integer codes
    # instead of a hash-groupby over raw 64-bit ids per call
    unique_dst, dst_codes = np.unique(dst, return_inverse=True)
    return {
        "unique_src": unique_src,
        "offsets": offsets,
        "share": share,
        "unique_dst": unique_dst,
        "dst_codes": dst_codes.astype(np.int32),
    }


class CsrAdjacency:
    """Disk-staged, worker-cached CSR adjacency for one edge table."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        n_buckets: int,
        n_rows_hint: int | None = None,
    ):
        self.spark = spark
        self.adj_dir = os.path.join(workdir, "csr_adjacency")
        self.n_buckets = n_buckets
        # rank-vector size hint: lets gather() pick a scale-adaptive
        # exchange width (guide §2 — don't tune for one scale) instead
        # of always paying n_buckets tiny tasks per iteration
        self.n_rows_hint = n_rows_hint
        # resume path: a previously staged directory carries its token
        self.token = self._read_token()
        self._carriers_cached: list[int] | None = None

    @property
    def _token_path(self) -> str:
        return os.path.join(self.adj_dir, "_stage_token")

    def _read_token(self) -> str | None:
        try:
            with open(self._token_path, encoding="utf-8") as fh:
                return fh.read().strip()
        except OSError:
            return None

    def _carriers(self) -> list[int]:
        """Per-bucket "carrier" partition keys that defeat hash-collision
        skew (guide §2.5 — synthetic partitioning keys with too few
        distinct values): P bucket ids hashed into P partitions occupy
        only ~0.63·P of them with a max load of 3 buckets per reducer
        (measured 18/32 on local[32]). Carrier c_b is chosen so Spark's
        Murmur3 ``pmod(hash(c_b), P)`` puts bucket b alone in partition
        b of the explicit ``repartition(P, carrier)`` exchanges both
        stage() and gather() use. One tiny driver-side job, cached on
        the instance; Spark itself evaluates the exact expression
        HashPartitioning uses, so there is no hash reimplementation to
        drift."""
        if self._carriers_cached is not None:
            return self._carriers_cached
        n = self.n_buckets
        span = max(4096, 64 * n)
        slot_to_carrier: dict[int, int] = {}
        while True:
            rows = (
                self.spark.range(0, span)
                .select(
                    F.col("id").cast("int").alias("c"),
                    F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("slot"),
                )
                .groupBy("slot")
                .agg(F.min("c").alias("c"))
                .collect()
            )
            slot_to_carrier = {int(r["slot"]): int(r["c"]) for r in rows}
            if len(slot_to_carrier) >= n:
                break
            span *= 4  # astronomically unlikely; widen and retry
        self._carriers_cached = [slot_to_carrier[b] for b in range(n)]
        return self._carriers_cached

    def _carrier_keyed(self, df: DataFrame, part_col: str) -> DataFrame:
        """Exchange ``df`` into exactly one partition per bucket: key the
        explicit P-way repartition on the bucket's carrier, then drop
        the key (a projection keeps the partitioning)."""
        arr = F.array(*[F.lit(c) for c in self._carriers()])
        return (
            df.withColumn("_ck", F.element_at(arr, F.col(part_col) + 1))
            .repartition(self.n_buckets, F.col("_ck"))
            .drop("_ck")
        )

    def stage(self, edges_with_share: DataFrame) -> None:
        """One-time write: edges(src, dst, share) → parquet bucketed by
        pmod(xxhash64(src), P). This is the only pass over the edges,
        and it stays entirely in the JVM (an npz-from-Python staging
        variant was measured SLOWER: shipping all E edges through the
        Arrow boundary cost more than it saved — the npz side files are
        instead built lazily on first load, see ``_load_block``).

        The pre-write exchange keys on the bucket's CARRIER
        (``_carriers``) so each write task holds exactly one bucket —
        one file per bucket directory, no collision stragglers — and
        sorts by src so the first load's stable argsort hits its
        adaptive fast path and parquet RLE-encodes the src runs."""
        staged = self._carrier_keyed(
            edges_with_share.withColumn(
                "part", F.pmod(F.xxhash64("src"), F.lit(self.n_buckets)).cast("int")
            ),
            "part",
        )
        (
            staged.sortWithinPartitions("src")
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
        per-bucket numpy gather + in-bucket dst partial sums, one
        zero-copy Arrow batch out per bucket."""
        if self.token is None:
            raise RuntimeError("CsrAdjacency.gather before stage(): no stage token")
        adj_dir, token = self.adj_dir, self.token
        # scale-adaptive exchange width: at production scale one reducer
        # per bucket (carrier-keyed, collision-free); for small rank
        # vectors a fixed n_buckets-way exchange is pure tiny-task
        # overhead (measured +2 s over 60 corpus-scale iterations), so
        # size the exchange like pregel.loop_tuning does and let each
        # task process several buckets (the batch loop below handles
        # multi-bucket partitions either way).
        n_parts = self.n_buckets
        if self.n_rows_hint is not None:
            from plwordnet_spark.graph.pregel import _ROWS_PER_PARTITION

            n_parts = max(
                1, min(self.n_buckets, self.n_rows_hint // _ROWS_PER_PARTITION + 1)
            )
        if n_parts == self.n_buckets:
            keyed = self._carrier_keyed(ranks_with_part, "part")
        else:
            keyed = ranks_with_part.repartition(n_parts, F.col("part"))

        def _gather(batches):
            import pyarrow as pa

            per_part: dict[int, list] = {}
            for batch in batches:
                cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
                parts = cols["part"].to_numpy(zero_copy_only=False)
                ids = cols["id"].to_numpy(zero_copy_only=False)
                rank = cols["rank"].to_numpy(zero_copy_only=False)
                for p in np.unique(parts):
                    m = parts == p
                    per_part.setdefault(int(p), []).append((ids[m], rank[m]))
            for bucket, chunks in per_part.items():
                key = (adj_dir, token, bucket)
                block = _CSR_CACHE.get(key)
                if block is None:
                    block = _load_block(adj_dir, bucket, token)
                    _cache_put(
                        adj_dir, token, bucket, block if block is not None else "empty"
                    )
                if block in (None, "empty"):
                    continue
                ids = np.concatenate([c[0] for c in chunks])
                rank = np.concatenate([c[1] for c in chunks])
                # align incoming ranks to the block's sorted source ids
                pos = np.searchsorted(block["unique_src"], ids)
                valid = (pos < len(block["unique_src"])) & (
                    block["unique_src"][np.minimum(pos, len(block["unique_src"]) - 1)]
                    == ids
                )
                rank_of_src = np.zeros(len(block["unique_src"]), dtype=np.float64)
                rank_of_src[pos[valid]] = rank[valid]
                # expand per-source rank to per-edge via run lengths
                counts = np.diff(block["offsets"])
                per_edge_rank = np.repeat(rank_of_src, counts)
                contrib = per_edge_rank * block["share"]
                # in-bucket combine: one bincount over the pre-factorized
                # dst codes sums per dst before the JVM shuffle (O(E)
                # adds, no per-call hash-groupby machinery)
                partial = np.bincount(
                    block["dst_codes"], weights=contrib,
                    minlength=len(block["unique_dst"]),
                )
                yield pa.RecordBatch.from_arrays(
                    [pa.array(block["unique_dst"]), pa.array(partial)],
                    ["dst", "partial"],
                )

        return (
            keyed.mapInArrow(_gather, "dst long, partial double")
            .groupBy("dst")
            .agg(F.sum("partial").alias("incoming"))
        )
