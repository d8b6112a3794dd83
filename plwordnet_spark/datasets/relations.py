"""Relational edge expansion — the reference's dataset-construction joins.

Three operators generalized from plWordNet's synset machinery to any
grouped graph (domain→pages here, synset→lexical-units there):

* :func:`expand_group_relations` — J2 (SURVEY.md §2.4): a relation
  between two groups expands to the cross product of their members
  ("fake relations", embedder.py:298-331). The canonical skew-prone
  join: hub groups blow up the cross product, so the group-relation
  side can be salted and the membership side replicated.
* :func:`synonymy_cliques` — J3: all ordered member pairs within one
  group (embedder.py:333-362 includes self-pairs; relgat.py:257-293
  excludes them — both behaviors kept behind ``include_self``).
* :func:`union_relation_streams` — U1: tagged union of edge sources
  (embedder.py:122-154 chains 4 streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expand_group_relations", "synonymy_cliques", "union_relation_streams"]


def expand_group_relations(
    group_rels: DataFrame,
    membership: DataFrame,
    n_salts: int = 1,
) -> DataFrame:
    """group_rels(parent_group, child_group, rel_id) × membership(member_id,
    group_id)² → (src, dst, rel_id) member-level cross-product edges.

    ``n_salts > 1`` splits each group-relation row into salt shards and
    routes members by hash — bounding the per-task fan-in for hub groups
    (explicit skew handling; AQE skew-join remains the backstop).
    """
    m_parent = membership.select(
        F.col("group_id").alias("parent_group"), F.col("member_id").alias("src")
    )
    m_child = membership.select(
        F.col("group_id").alias("child_group"), F.col("member_id").alias("dst")
    )
    rels = group_rels.select("parent_group", "child_group", "rel_id")
    if n_salts > 1:
        # replicate each relation row across salt shards; members route to
        # one shard by hash → the heavy build side splits n_salts ways
        salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("salt")
        rels = rels.select("*", salts)
        m_parent = m_parent.withColumn(
            "salt", F.pmod(F.xxhash64("src"), F.lit(n_salts)).cast("int")
        )
        first = rels.join(m_parent, ["parent_group", "salt"])
        return first.join(m_child, "child_group").select("src", "dst", "rel_id")
    return (
        rels.join(m_parent, "parent_group")
        .join(m_child, "child_group")
        .select("src", "dst", "rel_id")
    )


def synonymy_cliques(
    membership: DataFrame,
    rel_id: int = 0,
    include_self: bool = False,
) -> DataFrame:
    """All ordered member pairs within each group (synonymy edges).

    Groupwise self-join on group_id; with ``include_self`` the diagonal
    (u,u) stays (embedder semantics), otherwise it is dropped (relgat
    semantics).
    """
    a = membership.select("group_id", F.col("member_id").alias("src"))
    b = membership.select("group_id", F.col("member_id").alias("dst"))
    pairs = a.join(b, "group_id")
    if not include_self:
        pairs = pairs.filter(F.col("src") != F.col("dst"))
    return pairs.select("src", "dst", F.lit(rel_id).alias("rel_id"))


def union_relation_streams(streams: dict[str, DataFrame]) -> DataFrame:
    """Tagged unionByName of (src, dst, rel_id) streams; adds
    ``rel_source`` naming the originating stream."""
    tagged = [
        df.select("src", "dst", "rel_id").withColumn("rel_source", F.lit(name))
        for name, df in streams.items()
    ]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out
