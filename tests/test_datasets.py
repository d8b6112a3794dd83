"""Relation-expansion and balanced-split pipelines vs pure-Python oracles
(embedder.py semantics, SURVEY.md §2.4 J2/J3, §2.9 B1-B6)."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from plwordnet_spark.datasets.balanced import (
    balance_arithmetic,
    negative_synthesis,
    weight_partition,
)
from plwordnet_spark.datasets.relations import (
    expand_group_relations,
    synonymy_cliques,
    union_relation_streams,
)
from plwordnet_spark.datasets.split import (
    priority_dedup,
    sentence_pair_explode,
    train_test_split,
)

MEMBERSHIP = [  # (member_id, group_id)
    (1, 100), (2, 100), (3, 100),
    (4, 200), (5, 200),
    (6, 300),
]
GROUP_RELS = [  # (parent_group, child_group, rel_id)
    (100, 200, 11), (200, 300, 12), (100, 300, 11),
]


@pytest.fixture()
def membership(spark):
    return spark.createDataFrame(MEMBERSHIP, "member_id long, group_id long")


@pytest.fixture()
def group_rels(spark):
    return spark.createDataFrame(
        GROUP_RELS, "parent_group long, child_group long, rel_id int"
    )


def _expected_expansion():
    members = {}
    for m, g in MEMBERSHIP:
        members.setdefault(g, []).append(m)
    out = set()
    for pg, cg, rel in GROUP_RELS:
        for a in members[pg]:
            for b in members[cg]:
                out.add((a, b, rel))
    return out


def test_expand_group_relations(spark, membership, group_rels):
    got = {
        (r.src, r.dst, r.rel_id)
        for r in expand_group_relations(group_rels, membership).collect()
    }
    assert got == _expected_expansion()
    # salted path must produce the identical relation set
    salted = {
        (r.src, r.dst, r.rel_id)
        for r in expand_group_relations(group_rels, membership, n_salts=4).collect()
    }
    assert salted == got


def test_synonymy_cliques(spark, membership):
    got = {
        (r.src, r.dst) for r in synonymy_cliques(membership, rel_id=0).collect()
    }
    expected = {
        (a, b)
        for g in (100, 200, 300)
        for a in [m for m, gg in MEMBERSHIP if gg == g]
        for b in [m for m, gg in MEMBERSHIP if gg == g]
        if a != b
    }
    assert got == expected
    with_self = synonymy_cliques(membership, include_self=True).count()
    assert with_self == len(expected) + len(MEMBERSHIP)


def test_union_relation_streams(spark, membership, group_rels):
    expanded = expand_group_relations(group_rels, membership)
    cliques = synonymy_cliques(membership)
    union = union_relation_streams({"expansion": expanded, "synonymy": cliques})
    assert union.count() == expanded.count() + cliques.count()
    tags = {r.rel_source for r in union.select("rel_source").distinct().collect()}
    assert tags == {"expansion", "synonymy"}


def test_weight_partition_and_arithmetic(spark):
    rows = [(i, 0.05 if i % 3 == 0 else 0.5) for i in range(90)]
    df = spark.createDataFrame(rows, "sid long, relation_weight double")
    low, high = weight_partition(df, cut_weight=0.14)
    l, h = low.count(), high.count()
    assert l == 30 and h == 60

    # formula mirror of embedder.py:850-930
    ratio = 2.0
    res = balance_arithmetic(l, h, ratio)
    expected_add = int(ratio * (l * (h / l)) + 1) - l  # reference truncating int()
    assert res["add_examples"] == expected_add
    assert res["l_h_ratio"] == round(0.5 + expected_add / l)
    with pytest.raises(ValueError):
        balance_arithmetic(100, 10, ratio=2.0)


def test_negative_synthesis(spark):
    pool = spark.createDataFrame(
        [(f"document text number {i:03d} padded",) for i in range(40)],
        "text_parent string",
    )
    positives = spark.createDataFrame(
        [
            ("document text number 001 padded", "document text number 002 padded"),
            ("document text number 005 padded", "document text number 003 padded"),
        ],
        "text_parent string, text_child string",
    )
    neg1 = negative_synthesis(pool, positives, seed=7).collect()
    neg2 = negative_synthesis(pool, positives, seed=7).collect()
    assert sorted(map(tuple, neg1)) == sorted(map(tuple, neg2))  # deterministic
    pos_pairs = {
        ("document text number 001 padded", "document text number 002 padded"),
        ("document text number 002 padded", "document text number 001 padded"),
        ("document text number 005 padded", "document text number 003 padded"),
        ("document text number 003 padded", "document text number 005 padded"),
    }
    for row in neg1:
        assert (row.text_parent, row.text_child) not in pos_pairs
        assert row.text_parent != row.text_child
        assert row.relation_weight == 0.005
    assert 0 < len(neg1) <= 20


def test_train_test_split_deterministic(spark):
    df = spark.createDataFrame([(i, f"k{i}") for i in range(2000)], "i long, k string")
    a = train_test_split(df, ["k"], train_ratio=0.9, seed=1)
    b = train_test_split(df.repartition(13), ["k"], train_ratio=0.9, seed=1)
    assert (
        a.select("k", "split").exceptAll(b.select("k", "split")).count() == 0
    )
    frac = a.filter("split = 'train'").count() / 2000
    assert 0.87 < frac < 0.93


def test_priority_dedup(spark):
    train = spark.createDataFrame(
        [("a" * 30, "b" * 30), ("c" * 30, "d" * 30), ("x" * 10, "y" * 30)],
        "s1 string, s2 string",
    )
    test = spark.createDataFrame([("a" * 30, "b" * 30)], "s1 string, s2 string")
    out = priority_dedup(train, test, ["s1", "s2"], min_text_len=25, text_cols=["s1", "s2"])
    rows = out.collect()
    assert len(rows) == 1  # test-priority drop + min-length drop
    assert rows[0].s1 == "c" * 30


def test_sentence_pair_explode(spark):
    df = spark.createDataFrame(
        [("One. Two. Three.", "Alpha! Beta?")], "text_parent string, text_child string"
    )
    out = sentence_pair_explode(df)
    assert out.count() == 6
    pairs = {(r.sentence1, r.sentence2) for r in out.collect()}
    assert ("Two.", "Beta?") in pairs


def test_salting_splits_hub_fanin(spark):
    """Skew evidence: a hub group's cross-product fan-in must split
    across salt shards — max per-(relation, salt) build size ≈ 1/n_salts
    of the unsalted hub size (north rule: skew handled explicitly)."""
    from pyspark.sql import functions as F

    hub_members = [(i, 999) for i in range(400)]  # one hub group
    tail_members = [(1000 + i, i % 7) for i in range(70)]
    membership = spark.createDataFrame(
        hub_members + tail_members, "member_id long, group_id long"
    )
    group_rels = spark.createDataFrame(
        [(999, 0, 1), (999, 1, 1)], "parent_group long, child_group long, rel_id int"
    )
    n_salts = 8
    m_parent = membership.select(
        F.col("group_id").alias("parent_group"), F.col("member_id").alias("src")
    ).withColumn("salt", F.pmod(F.xxhash64("src"), F.lit(n_salts)).cast("int"))
    shard_sizes = (
        m_parent.filter(F.col("parent_group") == 999)
        .groupBy("salt")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in shard_sizes]
    assert len(sizes) == n_salts  # every shard used
    assert max(sizes) < 400 / n_salts * 2  # no shard holds the whole hub
    # and the salted expansion still returns the exact relation set
    from plwordnet_spark.datasets.relations import expand_group_relations

    plain = {
        (r.src, r.dst, r.rel_id)
        for r in expand_group_relations(group_rels, membership).collect()
    }
    salted = {
        (r.src, r.dst, r.rel_id)
        for r in expand_group_relations(group_rels, membership, n_salts=n_salts).collect()
    }
    assert salted == plain and len(plain) == 400 * 10 * 2
