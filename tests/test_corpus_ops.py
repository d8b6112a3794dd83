"""Stratified sampling, C4 line dedup, n-gram decontamination:
pure-python replay parity + structural properties."""

from __future__ import annotations

from collections import Counter

import numpy as np

from plwordnet_spark.textops.contamination import ngram_contamination
from plwordnet_spark.textops.lines import line_dedup, repeated_lines
from plwordnet_spark.textops.sampling import (
    SAMPLE_A,
    SAMPLE_B,
    SAMPLE_P,
    stratified_sample,
)

VOCAB = "alpha beta gamma delta epsilon zeta eta theta".split()


def _docs(spark, n=80, seed=11, lines_per_doc=6, words_per_line=3):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        lines = [
            " ".join(rng.choice(VOCAB, size=words_per_line))
            for _ in range(lines_per_doc)
        ]
        if i % 4 == 0:
            lines[2] = "cookie banner boilerplate"  # planted repeat
        rows.append((i, "\n".join(lines), ["en", "de", "fr"][i % 3]))
    return (
        spark.createDataFrame(rows, "doc_id long, text string, lang string"),
        rows,
    )


# --- stratified sampling -------------------------------------------------


def _py_keep(doc_id, lang, rates, default, seed=0):
    thresh = int(rates.get(lang, default) * SAMPLE_P)
    return ((doc_id % SAMPLE_P) * SAMPLE_A + SAMPLE_B + seed) % SAMPLE_P < thresh


def test_stratified_sample_matches_formula_and_is_partition_invariant(spark):
    df, rows = _docs(spark)
    rates = {"en": 0.25, "de": 0.75}
    got = {
        r["doc_id"]
        for r in stratified_sample(df, rates, default_rate=0.5).collect()
    }
    want = {i for i, _, lang in rows if _py_keep(i, lang, rates, 0.5)}
    assert got == want
    assert want  # non-degenerate
    assert want != {i for i, _, _ in rows}
    got_rep = {
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(7, "lang"), rates, default_rate=0.5
        ).collect()
    }
    assert got_rep == got


def test_stratified_sample_rate_bounds(spark):
    df, rows = _docs(spark, n=30)
    assert stratified_sample(df, {"en": 0.0, "de": 0.0, "fr": 0.0}).count() == 0
    assert stratified_sample(df, {}, default_rate=1.0).count() == len(rows)


# --- C4 line dedup -------------------------------------------------------


def _py_line_dedup(rows, min_count):
    counts = Counter(
        line for _, text, _ in rows for line in text.split("\n")
    )
    out = {}
    for i, text, _ in rows:
        kept = [l for l in text.split("\n") if counts[l] < min_count]
        if kept:
            out[i] = "\n".join(kept)
    return out


def test_line_dedup_matches_pure_python(spark):
    df, rows = _docs(spark)
    got = {
        r["doc_id"]: r["text"]
        for r in line_dedup(df, min_count=3).collect()
    }
    want = _py_line_dedup(rows, 3)
    assert got == want
    # the planted boilerplate is gone everywhere
    assert all("cookie banner boilerplate" not in t for t in got.values())
    # but rare lines survived
    assert any(got[i] for i in got)


def test_line_dedup_drops_fully_boilerplate_docs(spark):
    rows = [(1, "same\nsame", "en"), (2, "same\nother", "en"), (3, "unique", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r["text"] for r in line_dedup(df, min_count=2).collect()}
    # "same" occurs 3x -> removed; doc 1 has nothing left
    assert got == {2: "other", 3: "unique"}


def test_repeated_lines_histogram(spark):
    df, rows = _docs(spark)
    got = {r["line"]: r["n"] for r in repeated_lines(df, min_count=3).collect()}
    counts = Counter(l for _, t, _ in rows for l in t.split("\n"))
    assert got == {l: c for l, c in counts.items() if c >= 3}


# --- n-gram decontamination ----------------------------------------------


def _py_ngrams(text, n):
    toks = text.split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_ngram_contamination_matches_pure_python(spark):
    rng = np.random.RandomState(5)
    mk = lambda k: " ".join(rng.choice(VOCAB, size=k))
    bench_rows = [(100 + j, mk(12)) for j in range(3)]
    doc_rows = [(i, mk(10)) for i in range(20)]
    # plant a verbatim benchmark span inside doc 0
    doc_rows[0] = (0, doc_rows[0][1] + " " + bench_rows[0][1])
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    n = 3
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_hit"], r["contamination"])
        for r in ngram_contamination(docs, bench, n=n).collect()
    }
    bench_set = set().union(*(_py_ngrams(t, n) for _, t in bench_rows))
    for i, text in doc_rows:
        grams = _py_ngrams(text, n)
        hits = len(grams & bench_set)
        assert got[i][0] == len(grams)
        assert got[i][1] == hits
        assert abs(got[i][2] - round(hits / len(grams), 6)) < 1e-12
    assert got[0][1] >= 10  # the planted span registered


def test_ngram_contamination_short_doc_is_zero(spark):
    docs = spark.createDataFrame(
        [(1, "too short")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(2, "a benchmark with enough tokens here")], "doc_id long, text string"
    )
    row = ngram_contamination(docs, bench, n=5).collect()[0]
    assert (row["n_ngrams"], row["n_hit"], row["contamination"]) == (0, 0, 0.0)


# --- fixed-k per-stratum sampling ----------------------------------------


def test_sample_per_stratum_exact_k_and_deterministic(spark):
    df, rows = _docs(spark)
    from plwordnet_spark.textops.sampling import sample_per_stratum, sample_hash

    got = sample_per_stratum(df, 5).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # exactly 5 per stratum (every stratum has >5 rows here)
    assert {len(v) for v in by_lang.values()} == {5}
    # replay: k smallest (hash, id) per stratum
    def h(i):
        return ((i % SAMPLE_P) * SAMPLE_A + SAMPLE_B) % SAMPLE_P

    want = {}
    for i, _, lang in rows:
        want.setdefault(lang, []).append((h(i), i))
    for lang, lst in want.items():
        assert by_lang[lang] == {i for _, i in sorted(lst)[:5]}
    # partition invariance
    got2 = sample_per_stratum(df.repartition(13), 5).collect()
    assert {(r["doc_id"], r["lang"]) for r in got2} == {
        (r["doc_id"], r["lang"]) for r in got
    }


def test_sample_per_stratum_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "x", "rare"), (2, "y", "rare")], "doc_id long, text string, lang string"
    )
    from plwordnet_spark.textops.sampling import sample_per_stratum

    assert sample_per_stratum(df, 10).count() == 2


# --- shingle containment ---------------------------------------------------


def test_ngram_containment_detects_wrapped_quote(spark):
    from plwordnet_spark.textops.dedup import ngram_containment_pairs

    rng = np.random.RandomState(9)
    mk = lambda k: " ".join(rng.choice(VOCAB, size=k))
    short = mk(8)
    rows = [(0, short), (1, "intro words here " + short + " outro trailing words"),
            (2, mk(30)), (3, mk(30))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"])
        for r in ngram_containment_pairs(df, threshold=0.9).collect()
    }
    assert (0, 1) in got
    ca, cb = got[(0, 1)]
    assert ca == 1.0  # every shingle of the quote is inside the wrapper
    assert cb < 0.9  # but the wrapper is NOT contained in the quote
    assert all(p == (0, 1) for p in got)


def test_ngram_containment_matches_pure_python(spark):
    from plwordnet_spark.textops.dedup import ngram_containment_pairs

    rng = np.random.RandomState(3)
    mk = lambda k: " ".join(rng.choice(VOCAB[:4], size=k))
    rows = [(i, mk(12)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def sh(t):
        ws = t.split(" ")
        return {" ".join(ws[i : i + 3]) for i in range(max(len(ws) - 3, 0) + 1)}

    want = {}
    for i, ta in rows:
        for j, tb in rows:
            if i < j:
                A, B = sh(ta), sh(tb)
                c = len(A & B)
                if c and max(c / len(A), c / len(B)) >= 0.5:
                    want[(i, j)] = (c / len(A), c / len(B))
    got = {
        (r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"])
        for r in ngram_containment_pairs(df, threshold=0.5).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-12
        assert abs(got[k][1] - want[k][1]) < 1e-12


# --- skip-gram pairs from walks -------------------------------------------


def test_skipgram_pairs_matches_enumeration(spark):
    from plwordnet_spark.graph.walks import skipgram_pairs

    seqs = {(0, 0): [5, 6, 7, 8], (0, 1): [5, 9], (1, 0): [3]}
    rows = [
        (s, w, i, node)
        for (s, w), nodes in seqs.items()
        for i, node in enumerate(nodes)
    ]
    walks = spark.createDataFrame(rows, "start long, walk long, step long, node long")
    for window in (1, 2, 3):
        got = {
            (r["center"], r["context"]): r["n"]
            for r in skipgram_pairs(walks, window=window).collect()
        }
        want = Counter()
        for nodes in seqs.values():
            for i in range(len(nodes)):
                for j in range(i + 1, min(i + window, len(nodes) - 1) + 1):
                    want[(nodes[i], nodes[j])] += 1
                    want[(nodes[j], nodes[i])] += 1
        assert got == dict(want), f"window={window}"


def test_skipgram_pairs_counts_multiplicity(spark):
    from plwordnet_spark.graph.walks import skipgram_pairs

    # the same hop appears in two walks -> n == 2 for the mirrored pair
    rows = [(0, 0, 0, 1), (0, 0, 1, 2), (0, 1, 0, 1), (0, 1, 1, 2)]
    walks = spark.createDataFrame(rows, "start long, walk long, step long, node long")
    got = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert got == {(1, 2): 2, (2, 1): 2}


class TestMixtureWeights:
    def test_matches_pure_python(self, spark):
        from plwordnet_spark.textops.sampling import mixture_weights

        labels = ["en"] * 60 + ["de"] * 30 + ["pl"] * 10
        data = [(i, labels[i]) for i in range(100)]
        df = spark.createDataFrame(data, ["doc_id", "source"])
        got = {
            r["source"]: (r["n_docs"], r["weight"], r["expected_docs"])
            for r in mixture_weights(df, alpha=0.3, budget=1000).collect()
        }
        import math

        counts = {"en": 60, "de": 30, "pl": 10}
        tp = sum(n ** 0.3 for n in counts.values())
        for s, n in counts.items():
            w = n ** 0.3 / tp
            assert got[s][0] == n
            assert got[s][1] == round(w, 6)
            assert got[s][2] == math.floor(w * 1000)

    def test_alpha_flattens_toward_uniform(self, spark):
        from plwordnet_spark.textops.sampling import mixture_weights

        data = [(i, "big" if i < 90 else "small") for i in range(100)]
        df = spark.createDataFrame(data, ["doc_id", "source"])
        w03 = {r["source"]: r["weight"]
               for r in mixture_weights(df, alpha=0.3).collect()}
        w10 = {r["source"]: r["weight"]
               for r in mixture_weights(df, alpha=1.0).collect()}
        # alpha=1 reproduces raw proportions; alpha<1 lifts the tail
        assert w10["small"] == 0.1
        assert w03["small"] > 0.1
        # repeat_factor flags upsampling-induced duplication
        rf = {r["source"]: r["repeat_factor"]
              for r in mixture_weights(df, alpha=0.3, budget=10_000).collect()}
        assert rf["small"] > 1.0


class TestHostBoilerplate:
    def test_detects_site_template(self, spark):
        from plwordnet_spark.textops.lines import host_boilerplate_lines

        docs = []
        # host A: 4 pages share a footer; one page also repeats it twice
        for i in range(4):
            extra = "\nFOOTER" if i == 0 else ""
            docs.append((i, "a", f"unique {i}\nFOOTER{extra}"))
        docs.append((4, "a", "no template here"))
        # host B: 2 pages only — below min_pages
        docs.append((10, "b", "FOOTER\nx"))
        docs.append((11, "b", "FOOTER\ny"))
        df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
        got = {
            (r["host"], r["line"]): (r["n_pages"], r["host_pages"], r["frac"])
            for r in host_boilerplate_lines(
                df, min_frac=0.5, min_pages=3
            ).collect()
        }
        # within-page repeat counted once: 4 of 5 pages, frac 0.8
        assert got == {("a", "FOOTER"): (4, 5, 0.8)}

    def test_frac_threshold(self, spark):
        from plwordnet_spark.textops.lines import host_boilerplate_lines

        docs = [(i, "h", "common\nrare" if i < 2 else "common") for i in range(10)]
        df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
        lines = {
            r["line"]
            for r in host_boilerplate_lines(df, min_frac=0.5).collect()
        }
        assert lines == {"common"}


class TestStripHostBoilerplate:
    def test_strips_template_keeps_content(self, spark):
        from plwordnet_spark.textops.lines import strip_host_boilerplate

        docs = [(i, "a", f"unique {i}\nFOOTER") for i in range(4)]
        docs.append((4, "a", "FOOTER"))  # all-template page vanishes
        docs.append((10, "b", "FOOTER\nkeep"))  # host b below min_pages
        docs.append((11, "b", "FOOTER\nalso keep"))
        df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
        got = {
            r["doc_id"]: r["text"]
            for r in strip_host_boilerplate(
                df, min_frac=0.5, min_pages=3
            ).collect()
        }
        assert got == {
            0: "unique 0", 1: "unique 1", 2: "unique 2", 3: "unique 3",
            10: "FOOTER\nkeep", 11: "FOOTER\nalso keep",
        }

    def test_line_order_preserved(self, spark):
        from plwordnet_spark.textops.lines import strip_host_boilerplate

        docs = [(i, "h", f"x{i}\nTPL\ny{i}\nz{i}") for i in range(5)]
        df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
        got = strip_host_boilerplate(df, min_frac=0.5, min_pages=3)
        row = {r["doc_id"]: r["text"] for r in got.collect()}[2]
        assert row == "x2\ny2\nz2"
