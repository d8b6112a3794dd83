"""Gopher within-document repetition filters: pure-python replay
parity (random docs + crafted edge cases) and definitional checks."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from plwordnet_spark.textops.repetition import repetition_features

VOCAB = "alpha beta gamma delta epsilon zeta".split()


def _py_features(text, top_ns=(2,), dup_ns=(3,)):
    total = len(text)
    lines = [l for l in text.split("\n") if l]
    lc = Counter(lines)
    out = {
        "dup_line_frac": (
            round((len(lines) - len(lc)) / len(lines), 6) if lines else 0.0
        ),
        "dup_line_char_frac": (
            round(sum((c - 1) * len(l) for l, c in lc.items()) / total, 6)
            if total
            else 0.0
        ),
    }
    toks = [w for w in text.replace("\n", " ").split(" ") if w]
    for n in sorted(set(top_ns) | set(dup_ns)):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        gc = Counter(grams)
        if n in top_ns:
            top = min(gc, key=lambda g: (-gc[g], g)) if gc else ""
            out[f"top_{n}gram_char_frac"] = (
                round(gc[top] * len(top) / total, 6) if total and gc else 0.0
            )
        if n in dup_ns:
            dup = sum(c * len(g) for g, c in gc.items() if c >= 2)
            out[f"dup_{n}gram_char_frac"] = round(dup / total, 6) if total else 0.0
    return out


CRAFTED = [
    "a b c\na b c\nx y z",          # duplicate line + duplicate 2/3-grams
    "foo bar foo bar foo bar",       # dup fraction > 1 (overlap upper bound)
    "all unique words here now",
    "",                              # empty doc -> all zeros
    "one two",                       # shorter than n=3 -> zero 3-gram metrics
    "same\nsame\nsame\nsame",        # fully duplicated lines
    "x",                             # single token
]


def test_repetition_matches_pure_python_on_crafted_and_random(spark):
    rng = np.random.RandomState(7)
    texts = list(CRAFTED) + [
        "\n".join(
            " ".join(rng.choice(VOCAB, size=rng.randint(1, 6)))
            for _ in range(rng.randint(1, 5))
        )
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_features(
            df, top_ns=(1, 2), dup_ns=(2, 3)
        ).collect()
    }
    for i, t in enumerate(texts):
        want = _py_features(t, top_ns=(1, 2), dup_ns=(2, 3))
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-9), (i, k, t)


def test_repetition_tie_break_is_lexicographic(spark):
    # 'zz' and 'aa' both occur twice; the top unigram must be 'aa'
    df = spark.createDataFrame([(0, "zz aa zz aa")], "doc_id long, text string")
    row = repetition_features(df, top_ns=(1,), dup_ns=()).collect()[0]
    # top gram 'aa': 2 occurrences x 2 chars / 11 chars
    assert row["top_1gram_char_frac"] == pytest.approx(round(4 / 11, 6))


def test_repetition_gopher_filter_separates_spam_from_prose(spark):
    df = spark.createDataFrame(
        [
            (0, "buy now\nbuy now\nbuy now\nbuy now\nbuy now"),
            (1, "genuinely varied prose line\nanother different thought here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert out[0]["dup_line_frac"] > 0.3 and out[0]["dup_line_char_frac"] > 0.2
    assert out[1]["dup_line_frac"] == 0.0 and out[1]["dup_3gram_char_frac"] == 0.0
