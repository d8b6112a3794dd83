"""BM25 retrieval scoring, unigram-LM surprisal, and inverted-index
posting lists over the document corpus.

Why these live in a link-graph engine: the reference pairs its graph
with per-lexical-unit text relevance (plwordnet_handler exposes
definition/usage text per unit and the ML pipeline ranks related units
by textual similarity — plwordnet_ml's embedding ranking). At web
scale the equivalent primitives are BM25 (query→page relevance, the
ranking half of an anchor-text search index), a corpus unigram language
model (the CCNet-style "perplexity" quality gate used to filter
training corpora), and the inverted index itself.

Scale shapes
------------
* ``bm25_topk``: tokenization is a codegen array expression; one
  (doc, term) groupBy with map-side partial agg folds the token stream;
  document length comes from the same pass (no second scan). The query
  side filters to the query's terms BEFORE the df/idf join, so the
  scored frame is |matching docs| x |query terms| — never corpus-sized
  per term. Global top-k is a TakeOrderedAndProject, not a full sort.
* ``unigram_surprisal``: two shuffles total — (doc, term) tf and a
  term-dictionary-sized global histogram that joins back term→count.
  The global token count is a scalar broadcast. Everything else is
  codegen arithmetic; at 100 TB the dictionary join is the only
  non-map stage and the dictionary is Zipf-small relative to the
  corpus.
* ``build_postings``: the classic index build — one shuffle to
  (term, doc) counts, one to fold per-term posting lists. Posting
  lists are emitted as ordered arrays via ``array_sort(collect_list)``
  (order is restored in-executor, not by a global sort); ``min_df``
  prunes hapax terms before the fold so the heavy list-building agg
  only sees terms worth indexing. Giant stop-word postings are the
  known skew risk: ``max_df_frac`` drops terms present in more than
  that fraction of documents (they carry no retrieval signal and
  create one-key hot partitions).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plwordnet_spark.textops.quality import _words

__all__ = [
    "bm25_topk",
    "unigram_surprisal",
    "bigram_surprisal",
    "build_postings",
]


def _tf_dl(docs: DataFrame, text_col: str, id_col: str):
    """(doc_id, term, tf) and (doc_id, dl) from one tokenization pass."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf, dl


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    Okapi BM25 with the Lucene-style non-negative idf:

        idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d, t)     = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
        score(d)    = sum over query terms present in d

    N counts all documents; avgdl averages over documents with at
    least one token. Returns (doc_id, n_terms_matched, score, rank)
    with rank = row_number over (score desc, doc_id asc).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    tf, dl = _tf_dl(docs, text_col, id_col)
    n_docs = docs.select(F.count(F.lit(1)).alias("N"))
    avgdl = dl.select(F.avg("dl").alias("avgdl"))
    # df for the query terms only — term-count-sized, computed after the
    # isin filter so the groupBy folds a tiny slice of the tf table.
    qtf = tf.filter(F.col("term").isin(terms))
    df = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qtf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "s",
            F.col("idf")
            * F.col("tf")
            * (F.lit(k1) + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum("s").alias("score_raw"),
    )
    # sort+limit plans as TakeOrderedAndProject (per-partition heaps, no
    # global sort); the rank window then runs over k rows only.
    topk = agg.orderBy(F.desc("score_raw"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_raw"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            "doc_id",
            "n_terms_matched",
            F.round("score_raw", round_to).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def unigram_surprisal(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean surprisal under the corpus unigram MLE model.

    p(w) = count(w) / total_tokens over the whole corpus;
    surprisal(d) = -(1/|d|) * sum over tokens of ln p(w)
                 = -(1/|d|) * sum over distinct w of tf * ln p(w).

    This is the cheap stand-in for the KenLM perplexity gate used by
    CCNet-style corpus filtering: boilerplate and keyword-stuffed spam
    score LOW (all high-frequency tokens), fluent rare-vocabulary text
    scores high. Every token has corpus count >= its own tf, so p(w)
    is never zero and no smoothing is needed.

    Returns (doc_id, n_tokens, surprisal); empty documents produce no
    rows.
    """
    tf, _ = _tf_dl(docs, text_col, id_col)
    term_counts = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = term_counts.select(F.sum("cnt").alias("total"))
    return (
        tf.join(term_counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                -F.col("tf") * F.log(F.col("cnt") / F.col("total"))
            ).alias("sraw"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("sraw") / F.col("n_tokens"), round_to).alias(
                "surprisal"
            ),
        )
    )


def bigram_surprisal(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean conditional surprisal under the corpus bigram
    MLE model — the word-ORDER-sensitive quality gate
    :func:`unigram_surprisal` cannot express.

    p(w | v) = c(v, w) / c(v, ·) over the whole corpus;
    surprisal(d) = -(1/#bigrams) * sum over adjacent pairs of
    ln p(w | v). Shuffled or template-stitched text keeps its unigram
    profile but breaks its transitions, so it scores HIGH here while
    passing a unigram gate; boilerplate scores low in both. Like the
    unigram model, every document bigram occurs in the corpus counts at
    least once (the corpus contains the document), so MLE probabilities
    are never zero and no smoothing constant needs to be agreed on.

    Scale shape: the adjacent-pair build is a codegen array expression
    (no shuffle); then three dictionary-sized aggs — (doc, v, w) tf,
    corpus c(v, w), prefix c(v, ·) — each with map-side partials, and
    two term-keyed hash joins back. The prefix table is vocabulary-
    sized (Zipf-small); the hot prefix key ("the") is absorbed by the
    partial agg exactly like unigram's hot term. Documents with < 2
    tokens produce no row (no transitions to score).

    Returns (doc_id, n_bigrams, surprisal).
    """
    ws = _words(F.col(text_col))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("v"),
                F.element_at(ws, i + F.lit(1)).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<v:string,w:string>>"))
    bi = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("b")
    ).select("doc_id", "b.v", "b.w")
    tf2 = bi.groupBy("doc_id", "v", "w").agg(F.count(F.lit(1)).alias("tf"))
    cvw = tf2.groupBy("v", "w").agg(F.sum("tf").alias("c_vw"))
    cv = cvw.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    return (
        tf2.join(cvw, ["v", "w"])
        .join(cv, "v")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(
                -F.col("tf") * F.log(F.col("c_vw") / F.col("c_v"))
            ).alias("sraw"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("sraw") / F.col("n_bigrams"), round_to).alias(
                "surprisal"
            ),
        )
    )


def build_postings(
    docs: DataFrame,
    *,
    min_df: int = 2,
    max_df_frac: float = 1.0,
    ngram: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index posting lists: one row per indexed term.

    Returns (term, df, total_tf, postings) where postings is the
    doc-id list ordered ascending, serialized as a comma-joined string
    (portable across engines; callers wanting the array can split).
    Terms with df < ``min_df`` or df > ``max_df_frac``·N are pruned
    BEFORE the list fold — the stop-word postings they would build are
    both useless for retrieval and the hot keys that skew the fold.
    ``ngram`` > 1 indexes adjacent word n-grams (joined with ``_``) —
    phrase postings; the n-gram build stays a codegen array expression.
    """
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    if ngram == 1:
        tf, _ = _tf_dl(docs, text_col, id_col)
    else:
        ws = _words(F.col(text_col))
        grams = F.when(
            F.size(ws) >= ngram,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (ngram - 1)),
                lambda i: F.array_join(F.slice(ws, i, ngram), "_"),
            ),
        ).otherwise(F.array().cast("array<string>"))
        toks = docs.select(
            F.col(id_col).alias("doc_id"), F.explode(grams).alias("term")
        )
        tf = toks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).alias("tf")
        )
    n_docs = docs.select(F.count(F.lit(1)).alias("N"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    kept = (
        stats.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.col("N") * F.lit(max_df_frac))
        )
        .select("term", "df", "total_tf")
    )
    lists = (
        tf.join(F.broadcast(kept.select("term")), "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("doc_id"))), ","
            ).alias("postings")
        )
    )
    return kept.join(lists, "term").select(
        "term", "df", "total_tf", "postings"
    )
