"""Text quality scoring, language id, token counting, fingerprinting.

Training-data filters over the documents table — all pure column
expressions (whole-stage codegen; zero Python). The validation
philosophy mirrors the reference's text gates (min length, noise-phrase
blacklists, comment.py:491-531) generalized to corpus curation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = [
    "token_count_expr",
    "bpe_ish_token_count_expr",
    "quality_features",
    "language_id",
    "text_fingerprint",
    "text_fingerprint_poly",
]

# tiny function-word lists for the n-gram/stopword language heuristic —
# deliberately short: the point is the mechanism (broadcast dim +
# JVM set membership), not linguistic coverage
_PL_STOPWORDS = [
    "i", "w", "z", "na", "do", "nie", "się", "jest", "to", "że", "po",
    "dla", "od", "przez", "oraz", "ale", "jak", "co", "tak", "przy",
]
_EN_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
    "on", "with", "as", "are", "this", "be", "at", "by", "or", "an",
]


def _words(text_col):
    return F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"), lambda w: F.length(w) > 0
    )


def token_count_expr(text_col):
    """Whitespace token count."""
    return F.size(_words(text_col))


def bpe_ish_token_count_expr(text_col):
    """BPE-ish token count: word pieces + standalone punctuation
    (regex ``\\w+|[^\\w\\s]`` — the common pre-tokenizer shape)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(r"\w+|[^\w\s]"), 0))


def _char_ratio(text_col, pattern: str):
    total = F.length(text_col)
    kept = F.length(F.regexp_replace(text_col, pattern, ""))
    return F.when(total > 0, (total - kept) / total).otherwise(F.lit(0.0))


def _stopword_ratio(text_col, stopwords: list[str]):
    words = _words(text_col)
    hits = F.size(
        F.filter(words, lambda w: w.isin(stopwords))
    )
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(F.lit(0.0))


def quality_features(text_col):
    """Struct of quality signals + a composite score in [0, 1].

    Signals: length, token count, punctuation/digit ratios, mean word
    length, stopword ratio (max over languages). Score: starts at 1,
    penalized for extreme punct/digit density, too-short text, and
    absent function words — the standard web-text quality recipe
    (C4/Gopher-style rules, public literature).
    """
    n_chars = F.length(text_col)
    words = _words(text_col)
    n_tokens = F.size(words)
    punct = _char_ratio(text_col, r"[^\p{L}\p{N}\s]")
    digits = _char_ratio(text_col, r"[^0-9]")
    digit_ratio = F.when(n_chars > 0, F.lit(1.0) - digits).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_tokens,
    ).otherwise(F.lit(0.0))
    stop_pl = _stopword_ratio(text_col, _PL_STOPWORDS)
    stop_en = _stopword_ratio(text_col, _EN_STOPWORDS)
    stop = F.greatest(stop_pl, stop_en)
    score = (
        F.lit(1.0)
        - F.when(punct > 0.3, punct - 0.3).otherwise(0.0)
        - F.when(digit_ratio > 0.3, digit_ratio - 0.3).otherwise(0.0)
        - F.when(n_tokens < 5, 0.5).otherwise(0.0)
        - F.when(stop < 0.05, 0.2).otherwise(0.0)
    )
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        mean_word_len.alias("mean_word_len"),
        stop_pl.alias("stopword_ratio_pl"),
        stop_en.alias("stopword_ratio_en"),
        F.greatest(score, F.lit(0.0)).alias("quality_score"),
    )


def language_id(text_col, min_ratio: float = 0.02):
    """'pl' / 'en' / 'unknown' by function-word density."""
    pl = _stopword_ratio(text_col, _PL_STOPWORDS)
    en = _stopword_ratio(text_col, _EN_STOPWORDS)
    return (
        F.when((pl < min_ratio) & (en < min_ratio), F.lit("unknown"))
        .when(pl >= en, F.lit("pl"))
        .otherwise(F.lit("en"))
    )


def text_fingerprint(text_col, k: int = 8, shingle_chars: int = 16):
    """Rolling-hash document fingerprint: the k smallest hashes of
    overlapping character shingles (winnowing-style), as a sorted array.
    Equal fingerprints ⇒ near-identical content; JVM-only."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(col)
    positions = F.sequence(
        F.lit(1), F.greatest(n - F.lit(shingle_chars - 1), F.lit(1))
    )
    hashes = F.transform(
        positions, lambda i: F.xxhash64(col.substr(i, F.lit(shingle_chars)))
    )
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, k)


def text_fingerprint_poly(
    text_col, k: int = 8, shingle_chars: int = 16, mod: int = 2_147_483_647
):
    """:func:`text_fingerprint` with an engine-portable polynomial
    rolling hash — ``h = (h·31 + code_point) % mod`` folded over each
    shingle's characters — instead of xxhash64. Slightly slower (per-char
    fold vs one hash call) but bit-replayable by any SQL engine, which is
    what the driver's q_doc_fingerprint DuckDB oracle does; use the
    xxhash64 variant in production pipelines. All expressions are
    higher-order JVM functions — no Python in the loop."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(col)
    positions = F.sequence(
        F.lit(1), F.greatest(n - F.lit(shingle_chars - 1), F.lit(1))
    )

    def _poly(i):
        # split('', '') yields [''] and ascii('') is 0 — the empty-text
        # hash is 0 on both engines (DuckDB folds an empty code list).
        # REQUIRES Spark >= 3.4: SPARK-40194 changed split-on-empty to
        # drop the trailing empty element; on older Spark every shingle's
        # fold would gain a trailing ascii('')=0 step (h·31 mod p),
        # silently breaking parity with the documented polynomial and
        # the DuckDB oracle. Verified on the pinned Spark 4.1.
        codes = F.transform(
            F.split(col.substr(i, F.lit(shingle_chars)), ""),
            lambda c: F.ascii(c).cast("long"),
        )
        return F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, c: F.pmod(acc * F.lit(31) + c, F.lit(mod)),
        )

    hashes = F.transform(positions, _poly)
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, k)
