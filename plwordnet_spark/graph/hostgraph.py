"""Host-graph projection: page-level link graph → weighted host graph.

The standard first aggregation on a web crawl: collapse the ~10^12-page
edge table onto its ~10^8 hosts, producing (src_host, dst_host, weight)
— the graph Common Crawl publishes host ranks over, the input to
host-level PageRank / centrality, and the basis of nepotistic-link
(link-farm) heuristics à la Davison 2000.

Scale shape: the projection is two equi-joins of the edge table against
the (id → host) node map followed by one groupBy — all key-partitioned,
no driver state. The node map is n_pages-sized, so the joins are
sort-merge on id (the edge table is already partitioned by src for the
iterative jobs; the dst-side join reshuffles once). The output graph is
orders of magnitude smaller than its input (hosts ≪ pages), so map-side
partial aggregation collapses most of the groupBy's shuffle: every map
partition emits at most its distinct (src_host, dst_host) pairs.

Reference parity: plWordNet's relation-typing derives intra- vs
cross-domain rel ids at graph build (graph/build.py:76-82 here,
mirroring the reference's RelationType lookup, rel_type.py:12-28);
``intra_host_ratio`` generalizes that per-edge tag into the per-host
statistic used for spam heuristics and crawl prioritization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "backlink_diversity",
    "host_of",
    "intra_host_ratio",
    "project_to_hosts",
]


def host_of(col) -> "F.Column":
    """URL → lowercase host, port stripped: the canonical host key.

    Pure column expression (stays in whole-stage codegen): grab the
    authority between '//' and the next '/', drop userinfo and ':port'.
    """
    authority = F.split_part(F.split_part(col, F.lit("//"), F.lit(2)), F.lit("/"), F.lit(1))
    no_user = F.split_part(authority, F.lit("@"), F.lit(-1))
    return F.lower(F.split_part(no_user, F.lit(":"), F.lit(1)))


def project_to_hosts(
    edges: DataFrame,
    node_hosts: DataFrame,
    drop_intra: bool = False,
) -> DataFrame:
    """(src, dst[, weight]) × (id, host) → (src_host, dst_host, weight).

    ``weight`` sums edge multiplicity when the input carries a weight
    column, else counts edges. ``drop_intra`` removes same-host edges
    (the usual setting for host-level PageRank, where intra-host links
    are navigation noise)."""
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    src_h = node_hosts.select(F.col("id").alias("src"), F.col("host").alias("src_host"))
    dst_h = node_hosts.select(F.col("id").alias("dst"), F.col("host").alias("dst_host"))
    proj = (
        edges.select("src", "dst", w.alias("_w"))
        .join(src_h, "src")
        .join(dst_h, "dst")
    )
    if drop_intra:
        proj = proj.filter(F.col("src_host") != F.col("dst_host"))
    return (
        proj.groupBy("src_host", "dst_host")
        .agg(F.sum("_w").alias("weight"))
    )


def intra_host_ratio(edges: DataFrame, node_hosts: DataFrame) -> DataFrame:
    """Per src_host: (n_intra, n_total, intra_ratio) — the nepotistic-
    link statistic. Hosts whose pages link overwhelmingly to themselves
    (ratio → 1) are link-farm / template-navigation candidates; hosts
    near 0 are almost pure out-referrers."""
    hosts = project_to_hosts(edges, node_hosts)
    intra = F.when(F.col("src_host") == F.col("dst_host"), F.col("weight")).otherwise(
        F.lit(0.0)
    )
    return (
        hosts.groupBy("src_host")
        .agg(
            F.sum(intra).alias("n_intra"),
            F.sum("weight").alias("n_total"),
        )
        .select(
            "src_host",
            "n_intra",
            "n_total",
            (F.col("n_intra") / F.col("n_total")).alias("intra_ratio"),
        )
    )


def backlink_diversity(edges: DataFrame, node_hosts: DataFrame) -> DataFrame:
    """Per dst page: (n_backlinks, n_src_hosts, host_diversity) — how
    many links point at it and from how many DISTINCT hosts.

    The backlink-quality counterpoint to raw in-degree: a page with 10k
    in-links from one host (template footer, link farm) scores
    diversity 1/10000 ≈ 0, while genuinely referenced pages draw links
    from many hosts. Used with spam_mass (graph/trustrank.py) to
    triage high-PageRank-low-trust pages.

    Scale shape: one src-keyed join against the (id → host) map, then a
    single groupBy(dst) computing count + countDistinct(host). The
    distinct-host count cannot fold fully map-side (it is not
    algebraic), but its key space is bounded by hosts-per-dst ≪
    in-degree; Spark plans it as the standard two-phase partial
    distinct expand."""
    src_h = node_hosts.select(F.col("id").alias("src"), F.col("host").alias("src_host"))
    return (
        edges.select("src", "dst")
        .join(src_h, "src")
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("n_backlinks"),
            F.countDistinct("src_host").alias("n_src_hosts"),
        )
        .select(
            "dst",
            "n_backlinks",
            "n_src_hosts",
            (F.col("n_src_hosts") / F.col("n_backlinks")).alias("host_diversity"),
        )
    )
