"""Hypothesis property tests: extractor robustness + algorithm
cross-implementation agreement on random graphs."""

from __future__ import annotations

import random

import networkx as nx
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from plwordnet_spark.extraction import oracle


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_page_never_crashes_on_bytes(data):
    page = oracle.extract_page(data)
    assert isinstance(page.text, str)
    assert isinstance(page.links, list)


@given(st.text(max_size=1000))
@settings(max_examples=200, deadline=None)
def test_extract_page_never_crashes_on_text(text):
    page = oracle.extract_page(text.encode("utf-8", errors="replace"))
    assert isinstance(page.text, str)


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_clean_text_contract(text):
    out = oracle.clean_text(text)
    if out is not None:
        # validated output respects min length and is stripped
        assert len(out) >= oracle.MIN_EXAMPLE_LENGTH
        assert out == out.strip()
        # idempotence on its own output's validation step
        assert oracle.clean_text(out) is not None or any(
            phrase in out for phrase in oracle.REMOVE_PHRASES
        )


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_corpus_record_total_function(page_id):
    from plwordnet_spark.corpus import page_record

    rec = page_record(page_id, 2**31, seed=1)
    assert rec["url"].startswith("https://")
    assert isinstance(rec["html"], bytes)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(min_value=0, max_value=10_000))
def test_cc_methods_agree(spark, graph_seed):
    """large-star/small-star and hash-min must produce identical
    components on random graphs."""
    from plwordnet_spark.graph.components import connected_components

    rng = random.Random(graph_seed)
    n = rng.randint(2, 40)
    g = nx.gnp_random_graph(n, rng.uniform(0.02, 0.2), seed=graph_seed, directed=True)
    if g.number_of_edges() == 0:
        return
    edges = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in g.edges()],
        "src long, dst long, weight double",
    )
    nodes = spark.createDataFrame([(int(x),) for x in g.nodes()], "id long")
    a = {
        r.id: r.component
        for r in connected_components(spark, edges, nodes=nodes, method="two-phase").state.collect()
    }
    b = {
        r.id: r.component
        for r in connected_components(spark, edges, nodes=nodes, method="hashmin").state.collect()
    }
    assert a == b
