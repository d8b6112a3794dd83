"""Graph profiling statistics — the pre-flight checks of a web-graph run.

Before any iterative job on a crawl-scale link graph, the operator
questions are: how skewed are the degrees (salting / hot-src split
needed?), how many vertices/edges after dedup, is the degree
distribution the expected power law? The reference answers these with
in-memory NetworkX-style accounting over the WordNet graph
(plwordnet_handler/base/structure/graph.py); at 10^12 documents they
must be one-pass aggregates.

``degree_distribution`` is exact and tiny-output: the number of
distinct degree VALUES in a power-law graph grows ~O(max_degree^0.5),
so the result of grouping 10^11 per-node degrees by value is a few
thousand rows — safe to collect, plot, or threshold. Two shuffles
total (node-degree agg, histogram agg), both with map-side partial
aggregation; no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degree_distribution", "degrees"]


def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree, in_degree) over the directed multigraph —
    missing direction = 0 (full outer union of the two one-sided
    aggregates; a vertex appears iff it touches ≥1 edge)."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """(direction, degree, n_nodes) — exact degree histogram, one row
    per distinct (direction, degree value). direction ∈ {'out', 'in'}.
    Exact rather than log-binned: bin boundaries computed via floating
    log are engine-dependent at exact powers of two, while the exact
    histogram is both portable and small (see module docstring)."""
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    in_deg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    tagged = out_deg.select(F.lit("out").alias("direction"), "degree").unionAll(
        in_deg.select(F.lit("in").alias("direction"), "degree")
    )
    return tagged.groupBy("direction", "degree").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
