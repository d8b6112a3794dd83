"""Dedup suite + quality/langid vs pure-Python oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plwordnet_spark.textops.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from plwordnet_spark.textops.quality import (
    bpe_ish_token_count_expr,
    language_id,
    quality_features,
    text_fingerprint,
    token_count_expr,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("afternoon", "morning")),  # near dup of 0
        (3, "completely different text about spark dataframes and shuffles "
            "partitions executors and adaptive query execution plans"),
        (4, "Zupełnie inny tekst po polsku o silnikach zapytań i grafach "
            "które się nie powtarzają w ogóle"),
        (5, BASE + " extra tail words appended here"),  # near dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    docs = _docs(spark)
    kept = exact_dedup(docs)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 0 in ids and 1 not in ids  # min-id kept
    assert {2, 3, 4, 5} <= ids


def test_exact_dedup_normalization(spark):
    docs = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, " HELLO WORLD  ")],
        "doc_id long, text string",
    )
    assert exact_dedup(docs).count() == 1


def test_minhash_lsh_dedup(spark):
    docs = _docs(spark)
    kept, pairs = minhash_lsh_dedup(spark, docs, threshold=0.5, n_hashes=32, n_bands=16)
    pair_set = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in pair_set  # exact dup found
    assert any(a == 0 or b == 0 for a, b in pair_set if (a, b) != (0, 1))  # near dup too
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 0 in kept_ids and 1 not in kept_ids
    assert 3 in kept_ids and 4 in kept_ids


def test_simhash(spark):
    docs = _docs(spark)
    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[3]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(fp[0], fp[2]) <= 6
    assert hamming(fp[0], fp[3]) > 10

    pairs = simhash_near_dup_pairs(docs, max_hamming=6).collect()
    pair_set = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in pair_set
    assert all(3 not in p for p in pair_set)


def test_ngram_jaccard_matches_python(spark):
    docs = _docs(spark)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2).collect()
    }

    def shingle_set(text, n=3):
        words = " ".join(text.lower().split()).split(" ")
        return {" ".join(words[i : i + n]) for i in range(max(len(words) - n + 1, 1))}

    rows = {r.doc_id: r.text for r in _docs(spark).collect()}
    for (a, b), j in got.items():
        sa, sb = shingle_set(rows[a]), shingle_set(rows[b])
        expected = len(sa & sb) / len(sa | sb)
        assert abs(j - expected) < 1e-9, (a, b)
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! It's 42.",)], "t string")
    row = df.select(
        token_count_expr(F.col("t")).alias("ws"),
        bpe_ish_token_count_expr(F.col("t")).alias("bpe"),
    ).first()
    assert row.ws == 4
    # Hello , world ! It ' s 42 .  → 9
    assert row.bpe == 9


def test_quality_and_langid(spark):
    rows = [
        (0, "the cat is on the mat and it is a very fine day for walking outside"),
        (1, "to jest przykład tekstu w języku polskim który się dobrze czyta i nie ma błędów"),
        (2, "!!! ??? ### $$$ %%% ^^^ &&&"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        language_id(F.col("text")).alias("lang"),
        quality_features(F.col("text")).alias("q"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].lang == "en"
    assert by_id[1].lang == "pl"
    assert by_id[2].lang == "unknown"
    assert by_id[0].q.quality_score > 0.8
    assert by_id[2].q.quality_score < 0.5
    assert by_id[0].q.n_tokens == 16


def test_text_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, BASE), (1, BASE), (2, "something else entirely different here ok")],
        "doc_id long, text string",
    )
    rows = df.select("doc_id", text_fingerprint("text").alias("fp")).collect()
    by_id = {r.doc_id: tuple(r.fp) for r in rows}
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[2]


def test_dedup_on_driver_documents(spark, sf_dir):
    """The suite runs on the driver-provided documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    kept = exact_dedup(docs)
    assert 0 < kept.count() <= docs.count()
