"""Z-order (Morton curve) layout — multi-dimensional data clustering.

A 100 TB table sorted by ONE key skips parquet row groups only for
predicates on that key; a crawl table queried by BOTH host and
timestamp (or an edge table by src AND dst) needs multi-dimensional
locality. The Z-order curve interleaves the key bits so rows close in
EVERY dimension land in the same row groups, and each row group's
min/max footer stats then cover a small hyper-rectangle instead of a
full-width slab — the same DATA-LAYOUT optimization Delta/Iceberg
expose as ``OPTIMIZE ... ZORDER BY`` (and Databricks documents as their
data-skipping workhorse), built here from first principles:

* :func:`z_value_expr` — the Morton code as a pure codegen column
  expression: bit i of column j lands at position ``i·k + j``. A sum
  of constant-folded shift/mask terms, no UDF, exact in int64 for
  ``bits·k ≤ 62``.
* :func:`write_zordered` — range-partition + sort the table by its
  Z-value before writing: row groups become Z-curve segments.
* :func:`rowgroup_skip_stats` — the EVIDENCE reader: walks the written
  parquet footers (pyarrow) and reports how many row groups a
  box predicate must touch, straight from min/max stats — the
  deterministic, timing-free measure of what the layout buys.

Columns must be pre-quantized to non-negative ints < 2^bits (rank,
hash-bucket, or epoch-truncated — quantization choice is the caller's
domain knowledge). The curve does not help predicates on columns
outside the Z-set; keep the primary partition column (e.g. date) as a
directory partition and Z-order within it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value_expr", "write_zordered", "rowgroup_skip_stats"]


def z_value_expr(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code of ``k`` pre-quantized columns (each in
    [0, 2^bits)): bit ``i`` of column ``j`` → output bit ``i·k + j``.
    Pure shift/mask arithmetic — whole-stage codegen, engine-portable
    (the driver oracle replays the identical expression)."""
    k = len(cols)
    if k < 1:
        raise ValueError("need at least one column")
    if bits * k > 62:
        raise ValueError("bits * n_cols must be <= 62 to stay in int64")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z + (
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of ``cols``:
    range-partition on the Z-value (contiguous curve segments per file)
    and sort within partitions (contiguous segments per ROW GROUP).
    One extra shuffle at write time buys min/max skipping on every
    Z-dimension at read time, forever."""
    z = z_value_expr(list(cols), bits=bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_skip_stats(
    path: str, box: dict[str, tuple[int, int]]
) -> dict[str, int]:
    """Footer-stats evidence: for a conjunctive box predicate
    ``{col: (lo, hi)}`` (inclusive), how many parquet row groups could
    a min/max-pruning reader skip? Returns ``{"row_groups": total,
    "must_read": n, "skipped": total - n}``. Deterministic — no timing,
    just the same footer stats Spark's parquet reader prunes with."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = 0
    must = 0
    files = sorted(
        glob.glob(os.path.join(path, "*.parquet"))
        or glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(ci).name: ci for ci in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            overlap = True
            for col, (lo, hi) in box.items():
                st = meta.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot skip on this column
                if st.min > hi or st.max < lo:
                    overlap = False
                    break
            if overlap:
                must += 1
    return {"row_groups": total, "must_read": must, "skipped": total - must}
