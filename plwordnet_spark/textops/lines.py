"""Cross-document repeated-line removal (C4-style corpus cleaning).

Boilerplate on the web — navigation bars, cookie banners, license
footers — repeats VERBATIM across pages. The C4 pipeline (Raffel et
al., JMLR 2020, §2.2) attacks it line-wise: any line occurring more
than once in the dataset is dropped from every document, and documents
are re-assembled from their surviving lines in original order. The
reference's extraction stage normalizes per-page text
(plwordnet_handler text utils); this operator is the corpus-level
cleaning pass that only makes sense once all pages sit in one table.

Spark shape (three stages, all JVM-side):

1. ``posexplode(split(text, delim))`` — one row per (doc, pos, line).
2. global line histogram ``groupBy(line).count()`` — partial aggregates
   fold map-side, so a line repeated a million times costs one row per
   map partition, not a million shuffled rows (the same reason
   boilerplate is exactly the skewed key this operator exists for).
3. ``left_anti`` join of the exploded rows against the (small) set of
   over-represented lines — AQE broadcasts it — then per-document
   re-assembly: ``array_sort(collect_list(struct(pos, line)))`` +
   ``transform``/``array_join``, which restores original line order
   regardless of partitioning.

Documents whose every line is boilerplate vanish from the output (the
groupBy has no surviving rows) — the C4 behaviour; count the diff if
you need a removal report.

At 100 TB: one explode-shuffle + one broadcast anti-join + one
re-assembly shuffle on doc id; the histogram never materializes rare
lines driver-side, and the bad-line set is bounded by the boilerplate
population, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["line_dedup", "repeated_lines"]


def _exploded(docs: DataFrame, id_col: str, text_col: str, delim: str) -> DataFrame:
    # NOTE: F.split takes a Java regex; callers pass a pattern
    # (the default "\n" is regex-safe).
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    )


def repeated_lines(
    docs: DataFrame,
    *,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """(line, n) for every line occurring ``min_count``+ times corpus-wide.

    Map-side partial counts make this safe on arbitrarily hot
    boilerplate lines; the result is typically small enough to
    broadcast.
    """
    return (
        _exploded(docs, id_col, text_col, delim)
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def line_dedup(
    docs: DataFrame,
    *,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    join_delim: str = "\n",
) -> DataFrame:
    """Remove every occurrence of any line repeated ``min_count``+ times
    across the corpus; re-assemble surviving lines in original order.

    Returns ``(id_col, text_col)``. Documents with no surviving lines
    are dropped. ``delim`` is the split REGEX, ``join_delim`` the
    literal re-assembly separator (they coincide for the plain "\\n"
    default).
    """
    ex = _exploded(docs, id_col, text_col, delim)
    bad = (
        ex.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("line")
    )
    kept = ex.join(bad, "line", "left_anti")
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            join_delim,
        ).alias(text_col)
    )
