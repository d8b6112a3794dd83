"""Edge/node table construction: pages → link graph.

The web-scale generalization of the reference's graph build
(db_to_nx.py:46-284: relational tables → typed MultiDiGraph). Here the
property graph *is* two DataFrames (SURVEY.md §1.1) and the build is one
declarative plan:

    pages ──parse_page_udf──▶ (url, links)
          ──explode──▶ (src_url, dst_url)
          ──xxhash64──▶ (src, dst, rel_id)      rel_id: intra/cross domain
          ──dropDuplicates──▶ edges             (multigraph keyed by rel_id,
                                                 db_to_nx.py:262-284 analog)
    nodes = distinct urls ∪ link targets, with degrees

Scale choices (north rule: "partitioning / shuffle / skew handled
explicitly"):

* ids are ``xxhash64(url)`` — computed JVM-side, no Python; a collision
  audit job is provided (at 10^12 urls the 64-bit birthday bound makes
  auditing mandatory, not optional),
* edges are hash-repartitioned by ``src`` and written that way, so every
  downstream gather join starts co-located,
* hub detection runs off the degree table; a ``salt`` column
  (``pmod(xxhash64(src, dst), n_salts)`` for hub-dst edges, 0 otherwise)
  ships with the edge table so skew-aware jobs can split hot reduce keys
  without recomputing degrees.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plwordnet_spark.extraction.udfs import extract_links_udf

__all__ = ["GraphTables", "build_graph", "id_collisions", "merge_edge_tables", "validate_graph"]

REL_INTRA_DOMAIN = 1
REL_CROSS_DOMAIN = 2


def _domain(col):
    # 'https://host/...' → host
    return F.lower(F.split_part(F.split_part(col, F.lit("//"), F.lit(2)), F.lit("/"), F.lit(1)))


@dataclass
class GraphTables:
    nodes: DataFrame  # (id, url, domain, out_degree, in_degree, is_hub)
    edges: DataFrame  # (src, dst, rel_id, weight, salt)
    link_pairs: DataFrame  # (src_url, dst_url, rel_id, weight) — pre-hash, for audits


def build_graph(
    pages: DataFrame,
    hub_degree_threshold: int = 64,
    n_salts: int = 16,
    edge_partitions: int | None = None,
) -> GraphTables:
    """pages(url, html, …) → GraphTables.

    ``hub_degree_threshold``: in-degree above which a dst node counts as
    a hub (its incoming edges get a nonzero salt). On the synthetic
    corpus the hub domains (corpus.py power-law) trip this; on a real
    crawl the threshold would come from the degree histogram.
    """
    link_pairs = (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links_udf(F.col("html"))).alias("dst_url"),
        )
        # multigraph rel typing: intra- vs cross-domain link (RelationType
        # analog, rel_type.py:12-28 — here derived, not a lookup)
        .withColumn(
            "rel_id",
            F.when(
                _domain(F.col("src_url")) == _domain(F.col("dst_url")),
                F.lit(REL_INTRA_DOMAIN),
            ).otherwise(F.lit(REL_CROSS_DOMAIN)),
        )
        # collapse duplicate anchors; weight = multiplicity (kept so the
        # dedup is lossless — dropDuplicates would discard it)
        .groupBy("src_url", "dst_url", "rel_id")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    ).cache()  # consumed by edges, nodes AND degrees — one extraction pass,
    # not three (at production scale this is a persisted staging table)

    edges_unsalted = link_pairs.select(
        F.xxhash64("src_url").alias("src"),
        F.xxhash64("dst_url").alias("dst"),
        "rel_id",
        "weight",
    )

    page_nodes = pages.select(F.col("url"))
    target_nodes = link_pairs.select(F.col("dst_url").alias("url"))
    urls = page_nodes.unionByName(target_nodes).distinct()

    out_deg = edges_unsalted.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = edges_unsalted.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )

    nodes = (
        urls.select(F.xxhash64("url").alias("id"), "url", _domain(F.col("url")).alias("domain"))
        .join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .fillna(0, subset=["out_degree", "in_degree"])
        .withColumn("is_hub", F.col("in_degree") >= F.lit(hub_degree_threshold))
    )

    # hub dst set computed straight from the in-degree aggregate: every
    # in_deg id IS a dst node id, so this equals nodes.filter(is_hub)
    # exactly — but the edge table's plan no longer drags in the whole
    # node pipeline (urls-distinct + two degree joins) just to learn
    # which dst ids are hubs (guide §2.4: don't compute what the
    # consumer throws away)
    hubs = in_deg.filter(
        F.col("in_degree") >= F.lit(hub_degree_threshold)
    ).select(F.col("id").alias("dst"))
    # broadcast: the hub set is tiny by construction (tail of the degree
    # distribution); the join only tags edges, no shuffle of the edge table
    edges = (
        edges_unsalted.join(F.broadcast(hubs.withColumn("h", F.lit(1))), "dst", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("h").isNotNull(),
                F.pmod(F.xxhash64("src", "dst"), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("h")
        .select("src", "dst", "rel_id", "weight", "salt")
    )
    if edge_partitions:
        edges = edges.repartition(edge_partitions, "src")
    else:
        edges = edges.repartition("src")
    return GraphTables(nodes=nodes, edges=edges, link_pairs=link_pairs)


def merge_edge_tables(existing: DataFrame, new: DataFrame) -> DataFrame:
    """Incremental crawl merge: union two (src, dst, rel_id, weight[, salt])
    edge tables, summing multiplicity weights of edges seen in both —
    the MERGE-INTO shape of an Iceberg upsert, expressed relationally
    (the reference's incremental skip-already-done batch pattern,
    plwordnet_ml/.../wrappers.py:292-304, upgraded to additive merge).
    Salt is recomputed downstream by the degree job; dropped here."""
    cols = ["src", "dst", "rel_id", "weight"]
    return (
        existing.select(*cols)
        .unionByName(new.select(*cols))
        .groupBy("src", "dst", "rel_id")
        .agg(F.sum("weight").alias("weight"))
    )


def id_collisions(nodes: DataFrame) -> int:
    """xxhash64 collision audit: #distinct urls − #distinct ids."""
    row = nodes.agg(
        F.countDistinct("url").alias("u"), F.countDistinct("id").alias("i")
    ).first()
    return int(row["u"] - row["i"])


def validate_graph(tables: GraphTables) -> dict:
    """Cohesion checks — the db_to_nx.py:286-391 analog as one job.

    Returns a dict of named counts; raises ValueError on violation
    (mirrors the reference's RuntimeError on edge-count mismatch,
    db_to_nx.py:342-345).
    """
    # three jobs total (one scan per table): node stats in one agg,
    # edge count + missing-dst refs in one outer-join agg, pair count
    node_row = tables.nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("url").alias("u"),
        F.countDistinct("id").alias("i"),
    ).first()
    node_count, url_count = int(node_row["n"]), int(node_row["u"])
    collisions = int(node_row["u"] - node_row["i"])
    # distinct ids on the build side: duplicate node ids (the collision
    # case this validator exists to catch) must not fan out edge rows
    # and corrupt edge_count — collisions are reported by their own check
    edge_row = (
        tables.edges.join(
            tables.nodes.select(F.col("id").alias("dst")).distinct()
            .withColumn("_has", F.lit(True)),
            "dst",
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("e"),
            F.coalesce(F.sum(F.when(F.col("_has").isNull(), 1)), F.lit(0)).alias("d"),
        )
        .first()
    )
    edge_count, dangling_refs = int(edge_row["e"]), int(edge_row["d"])
    pair_count = tables.link_pairs.count()
    report = {
        "edges": edge_count,
        "link_pairs": pair_count,
        "nodes": node_count,
        "distinct_urls": url_count,
        "id_collisions": collisions,
        "edges_without_dst_node": dangling_refs,
    }
    if edge_count != pair_count:
        raise ValueError(f"edge/link-pair count mismatch: {report}")
    if node_count != url_count:
        raise ValueError(f"node/url count mismatch: {report}")
    if collisions:
        raise ValueError(f"id hash collisions: {report}")
    if dangling_refs:
        raise ValueError(f"edges referencing missing nodes: {report}")
    return report
