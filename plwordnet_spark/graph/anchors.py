"""Anchor-text table + per-target anchor-term profiles.

The other half of the hyperlink besides the edge itself: the anchor text
pointing AT a page, aggregated over all its in-links, is the web's
crowd-sourced description of that page (the classic ranking/labeling
signal that rides the same link graph PageRank does). This generalizes
the reference's relation-typed edge annotations (db_to_nx.py:24-130
maps relations onto a MultiDiGraph precisely so each edge can carry a
typed payload; rel_type.py:12-28 is that payload's vocabulary) to the
web regime: payload = the linking page's anchor string.

Two operators:

* :func:`build_anchor_table` — pages(url, html) → (src_url, dst_url,
  anchor, weight): one vectorized-Arrow extraction pass
  (``extract_anchors_udf``, same oracle code path as the link
  extractor), explode, duplicate (src, dst, anchor) triples collapsed
  with multiplicity kept — the lossless-dedup convention of
  ``build_graph`` (build.py:83).
* :func:`anchor_term_topk` — (dst, anchor) pairs → top-k anchor TERMS
  per target with counts: explode whitespace terms (textops' exact
  tokenization, so anchor profiles and document token stats agree),
  count per (dst, term), per-dst row_number window. All JVM-side
  column expressions; the window's top-k prunes in-shuffle.

Scale shape: extraction is embarrassingly parallel over page
partitions; the term count is one partial-agg groupBy on (dst, term) —
anchor hubs (everyone links "home" to the same portal) fold map-side
like any algebraic agg; the final window shuffles only the counted
(dst, term) rows, orders of magnitude smaller than the raw anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from plwordnet_spark.extraction.udfs import extract_anchors_udf
from plwordnet_spark.textops.quality import _words

__all__ = ["build_anchor_table", "anchor_term_topk"]


def build_anchor_table(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages(url, html, …) → (src_url, dst_url, anchor, weight).

    weight = multiplicity of the exact (src, dst, anchor) triple on the
    source page (same page linking the same target twice with the same
    words). Self-links are kept — the caller's edge-table conventions
    (build_graph drops src==dst later) decide."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_anchors_udf(F.col(html_col))).alias("a"),
        )
        .select(
            "src_url",
            F.col("a.url").alias("dst_url"),
            F.col("a.anchor").alias("anchor"),
        )
        .groupBy("src_url", "dst_url", "anchor")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def anchor_term_topk(
    anchor_pairs: DataFrame,
    top_k: int = 3,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(…, dst, anchor) rows → (dst, term, n, rank): each target's
    ``top_k`` most frequent anchor terms.

    Ties break on term ascending (deterministic output — the golden-test
    discipline every ranked operator here follows). Empty anchors
    contribute nothing. Pass a pre-weighted frame through ``explode`` +
    your own count if per-edge weights must scale term counts; this
    operator counts occurrences, the common IR convention."""
    terms = anchor_pairs.select(
        F.col(dst_col).alias("dst"),
        F.explode(_words(F.col(anchor_col))).alias("term"),
    )
    counts = terms.groupBy("dst", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    win = W.partitionBy("dst").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= top_k)
        .select("dst", "term", "n", "rank")
    )
