"""Crawl-frontier scheduling: politeness slots + fetcher assignment.

The operational side of a Common-Crawl-style pipeline: given a frontier
of candidate URLs with priorities (PageRank, OPIC score, freshness),
produce a fetch schedule that (a) never hits the same host twice in the
same politeness slot, (b) pins each host to ONE fetcher so per-host
rate limiting and robots.txt caching stay local, and (c) fetches
high-priority URLs first within each host. The reference's analogue is
its batched, connection-pinned Milvus insert loop (one writer per
collection, batch order deterministic — insert_handler.py:44-54); at
crawl scale the same discipline applies to hosts instead of
collections.

Everything is deterministic and engine-portable: the slot is a window
rank, the fetcher is a congruential hash of the host's stable numeric
key (its minimum member id — computable by any engine, no string
hashing variance).

Scale shape: ONE shuffle, on host — both window expressions (the
politeness rank and the host key) share the same partitioning, so
Catalyst plans a single exchange; the fetcher assignment is pure
codegen arithmetic on top. Host skew (a megasite with 10^8 frontier
URLs) does not hot-spot the shuffle more than the host's own fetch
queue inherently is — and the per-host queue IS the politeness
semantics; cap it upstream with ``max_urls_per_host`` if a site
should not monopolize a fetcher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plwordnet_spark.textops.sampling import SAMPLE_A, SAMPLE_B, SAMPLE_P

__all__ = ["schedule_frontier", "canonical_url_expr", "TRACKING_PARAM_RE"]

# query parameters that never change page content: analytics campaign
# tags and click ids. Kept conservative — canonicalization must never
# merge two genuinely different resources.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)="


def canonical_url_expr(url_col, *, drop_www: bool = True, tracking_re: str = TRACKING_PARAM_RE):
    """Column expression: canonical form of an absolute http(s) URL.

    The URL-dedup primitive a crawler applies before the frontier and
    the exact-dedup stage apply after fetch: the same resource reached
    through case-varied hosts, default ports, fragments, tracking
    params, shuffled query order, or a trailing slash must collapse to
    ONE key, or every downstream count (frontier size, dedup ratio,
    host quotas) is inflated. Rules, in order:

    1. strip the fragment (``#…`` — client-side only),
    2. lowercase scheme and host (RFC 3986 §6.2.2.1; path case is
       PRESERVED — paths are case-sensitive),
    3. drop the scheme's default port (``:80`` http / ``:443`` https),
    4. optionally drop a leading ``www.`` (``drop_www``),
    5. empty path → ``/``; otherwise strip one trailing slash,
    6. drop query params matching ``tracking_re``; sort the rest
       byte-lexicographically and rejoin.

    Pure codegen string ops — zero shuffle, no UDF — and every rule is
    replayable with portable SQL string functions, which is how the
    driver oracle checks it. Non-URL junk degrades gracefully (no
    scheme → empty scheme prefix) rather than erroring mid-pipeline.
    """
    u = F.regexp_replace(url_col, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?#]+)://", 1))
    rest = F.regexp_replace(u, r"^[^:/?#]+://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    if drop_www:
        host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"(.)/$", "$1")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(tracking_re),
        )
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


def schedule_frontier(
    frontier: DataFrame,
    *,
    n_fetchers: int = 16,
    priority_col: str = "priority",
    url_col: str = "url",
    host_col: str = "host",
    id_col: str = "doc_id",
    max_urls_per_host: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """frontier(id, url, host, priority) → + (slot, fetcher).

    ``slot``: 0-based politeness sequence within the host — the t-th
    fetch of that host (priority desc, url asc; a fetcher issuing one
    request per host per slot-tick automatically honours crawl-delay).
    ``fetcher``: stable fetcher index in [0, n_fetchers) from the
    congruential hash of the host's minimum ``id_col`` — all URLs of a
    host land on one fetcher. ``max_urls_per_host`` drops rows ranked
    beyond the cap (megasite guard; the rank filter prunes in-shuffle).
    """
    if n_fetchers < 1:
        raise ValueError(f"n_fetchers must be >= 1, got {n_fetchers}")
    by_host = Window.partitionBy(host_col)
    rank = F.row_number().over(
        by_host.orderBy(F.desc(priority_col), F.col(url_col))
    )
    host_key = F.min(F.col(id_col)).over(by_host)
    fetcher = (
        ((host_key % SAMPLE_P) * F.lit(SAMPLE_A) + F.lit(SAMPLE_B + seed))
        % SAMPLE_P
    ) % n_fetchers
    out = frontier.withColumn("_rank", rank).withColumn(
        "fetcher", fetcher.cast("int")
    )
    if max_urls_per_host is not None:
        out = out.filter(F.col("_rank") <= max_urls_per_host)
    return out.withColumn(
        "slot", (F.col("_rank") - 1).cast("int")
    ).drop("_rank")
