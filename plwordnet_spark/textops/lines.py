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

__all__ = ["line_dedup", "repeated_lines", "host_boilerplate_lines", "strip_host_boilerplate"]


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


def host_boilerplate_lines(
    docs: DataFrame,
    *,
    min_frac: float = 0.5,
    min_pages: int = 3,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Site-template detector: lines present in >= ``min_frac`` of a
    host's pages (hosts with >= ``min_pages`` pages only).

    The corpus-global histogram above catches web-WIDE boilerplate
    ("All rights reserved"); per-host frequency catches each SITE's
    template — nav bars, footers, category sidebars — which repeats on
    most pages of one host but nowhere else, exactly the content a
    main-text extractor must drop (the site-level generalization of
    the reference's per-page REMOVE_PHRASES cleanup,
    plwordnet_ml utils/comment.py). Presence is per PAGE (a line twice
    on one page counts once), so frac is "share of the host's pages
    carrying this line".

    Returns ``(host, line, n_pages, host_pages, frac)``.

    Shape: one distinct over (host, page, line) — partial-agg absorbs
    within-page repeats — one (host, line) count, one join against the
    host-size histogram (host-cardinality-sized, broadcast). Nothing
    scales with corpus size except the explode itself.
    """
    lines = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), delim)).alias("line"),
    ).distinct()
    host_pages = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("host_pages")
    )
    per_line = lines.groupBy("host", "line").agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    return (
        per_line.join(F.broadcast(host_pages), "host")
        .filter(
            (F.col("host_pages") >= min_pages)
            & (F.col("n_pages") >= F.col("host_pages") * F.lit(min_frac))
        )
        .select(
            "host",
            "line",
            "n_pages",
            "host_pages",
            F.round(F.col("n_pages") / F.col("host_pages"), 6).alias("frac"),
        )
    )


def strip_host_boilerplate(
    docs: DataFrame,
    *,
    min_frac: float = 0.5,
    min_pages: int = 3,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    join_delim: str = "\n",
) -> DataFrame:
    """Main-content extraction at the corpus level: delete every line
    that :func:`host_boilerplate_lines` flags as its host's template,
    re-assembling each page's surviving lines in original order.

    Returns ``(host_col, id_col, text_col)``; pages that were ALL
    template vanish (the line_dedup convention — count the diff for a
    removal report). This is the two-pass trafilatura-style cleanup a
    single-page extractor cannot do: pass 1 learns each site's template
    from line frequency across the host's pages, pass 2 is one
    anti-join against the (host, line) template set — broadcast-sized,
    since templates are bounded by sites × template lines, not corpus
    size — and the same array_sort(collect_list) order-restoring
    re-assembly as :func:`line_dedup`.
    """
    tpl = host_boilerplate_lines(
        docs,
        min_frac=min_frac,
        min_pages=min_pages,
        host_col=host_col,
        id_col=id_col,
        text_col=text_col,
        delim=delim,
    ).select(F.col("host").alias(host_col), "line")
    ex = docs.select(
        F.col(host_col),
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    )
    kept = ex.join(tpl, [host_col, "line"], "left_anti")
    return kept.groupBy(host_col, id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            join_delim,
        ).alias(text_col)
    )
