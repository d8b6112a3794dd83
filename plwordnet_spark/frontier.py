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

__all__ = ["schedule_frontier"]


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
