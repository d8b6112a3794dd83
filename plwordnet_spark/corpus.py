"""Deterministic synthetic web-page corpus (the engine's input table).

Produces the table from BASELINE.json input_hint:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``

Every field is a pure function of ``(seed, page_id)`` — generation is
partition-count invariant and reproducible, so the corpus can be
synthesized at any scale on the cluster itself (FIXTURES.md §1: "no
external data"). Structural choices mirror the production graph the
reference was run on:

* power-law domain sizes with a hub domain (skewed in-degree — drives the
  salting path; reference scale facts: INSTALL.md:207-227),
* power-law out-degree per page,
* page text assembled in the reference comment grammar (##K topic, ##D
  definition, [##P ...] examples, ##A sentiment, {##L ...} external link,
  comment.py:198-212) wrapped in HTML, plus injected web-noise phrases
  that the extractor must scrub,
* ``text`` column = ground-truth oracle extraction (what the distributed
  extractor must reproduce byte-for-byte).

Generation is distributed: ``spark.range(n) → mapInPandas`` — no driver
loop, no collect; 10^12 rows is the same plan with more partitions.
"""

from __future__ import annotations

import datetime as _dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from plwordnet_spark.extraction import oracle

__all__ = ["PAGES_SCHEMA", "generate_pages", "page_record", "url_of", "domain_of"]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_BASE_TS = _dt.datetime(2025, 6, 1, tzinfo=_dt.timezone.utc)

_SYLLABLES = [
    "ka", "to", "mi", "ra", "zu", "ne", "pol", "war", "lek", "syn",
    "gra", "net", "do", "ber", "li", "sta", "kro", "wa", "tek", "sor",
]

_NOISE = [
    "All rights reserved.",
    "Click here",
    "Advertisement",
    "Subscribe to our newsletter",
    "Skip to content",
]

_EMOTIONS = ["radość", "smutek", "zaufanie", "strach", "złość"]
_CATEGORIES = ["jakość", "błąd", "użyteczność"]


def _word(rng: random.Random) -> str:
    return "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4)))


def _sentence(rng: random.Random, min_words: int, max_words: int) -> str:
    words = [_word(rng) for _ in range(rng.randint(min_words, max_words))]
    return " ".join(words)


def n_domains_for(n_pages: int) -> int:
    return max(4, n_pages // 40)


def domain_of(page_id: int, n_pages: int, seed: int) -> int:
    """Deterministic power-law domain assignment (computable for any page
    id without generating the page — link targets need it)."""
    rng = random.Random(f"{seed}:dom:{page_id}")
    idx = int(rng.paretovariate(1.1)) - 1
    return min(idx, n_domains_for(n_pages) - 1)


def url_of(page_id: int, n_pages: int, seed: int) -> str:
    return f"https://d{domain_of(page_id, n_pages, seed)}.example.org/p/{page_id}"


def _out_links(rng: random.Random, page_id: int, n_pages: int, seed: int) -> list[str]:
    """Power-law out-degree; targets biased toward low page ids (hubs)."""
    k = min(40, max(1, int(rng.paretovariate(1.3))))
    popular_cap = max(2, int(n_pages**0.5))
    targets = []
    for _ in range(k):
        if rng.random() < 0.3:
            tid = rng.randrange(popular_cap)
        else:
            tid = rng.randrange(n_pages)
        if tid != page_id:
            targets.append(url_of(tid, n_pages, seed))
    return targets


def page_record(page_id: int, n_pages: int, seed: int = 42) -> dict:
    """Pure function (seed, page_id) → one pages row."""
    rng = random.Random(f"{seed}:page:{page_id}")
    url = url_of(page_id, n_pages, seed)
    lang = "pl" if rng.random() < 0.6 else "en"

    topic = _sentence(rng, 1, 3)
    definition = _sentence(rng, 6, 18)
    examples = [_sentence(rng, 5, 14) for _ in range(rng.randint(0, 3))]
    links = _out_links(rng, page_id, n_pages, seed)

    body: list[str] = [f"<h1>{_word(rng)}</h1>"]
    body.append(f"<p>##K: {topic} ##D: {definition}</p>")
    for i, link in enumerate(links):
        body.append(f'<a href="{link}">{_word(rng)} {i}</a>')
    for ex in examples:
        body.append(f"<p>[##P: {ex}]</p>")
    if rng.random() < 0.25:
        emotions = ", ".join(rng.sample(_EMOTIONS, rng.randint(1, 2)))
        category = rng.choice(_CATEGORIES)
        strength = rng.choice(["+ s", "- s", "+ m", "- m", "amb"])
        sent_example = _sentence(rng, 5, 12)
        body.append(f"##A1: {{{emotions}; {category}}} {strength} [{sent_example}]")
    if rng.random() < 0.2:
        body.append(f"{{##L: https://ext{rng.randrange(50)}.example.net/a }}")
    if rng.random() < 0.5:
        body.append(f"<p>{rng.choice(_NOISE)}</p>")
    # non-navigational hrefs the normalizer must drop
    if rng.random() < 0.3:
        body.append('<a href="#section">anchor</a><a href="mailto:x@y.z">mail</a>')
    body.append("<script>var x = 1; // ##D: decoy inside script</script>")

    html_text = (
        f"<html><head><title>{_word(rng)}</title></head><body>"
        + "\n".join(body)
        + "</body></html>"
    )
    html_bytes = html_text.encode("utf-8")
    parsed = oracle.extract_page(html_bytes, url=url)
    return {
        "url": url,
        "warc_ts": _BASE_TS + _dt.timedelta(seconds=page_id),
        "html": html_bytes,
        "text": parsed.text,
        "lang": lang,
    }


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed corpus build: range → mapInPandas(page_record)."""
    if partitions is None:
        partitions = max(1, min(n_pages // 500 + 1, spark.sparkContext.defaultParallelism))

    def _gen(batches):
        for pdf in batches:
            rows = [page_record(int(i), n_pages, seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=list(PAGES_SCHEMA.fieldNames()))

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(_gen, schema=PAGES_SCHEMA)
    )
