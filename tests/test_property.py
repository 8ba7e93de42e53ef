"""Property-based robustness: random graphs vs oracles (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pregel_spark.graph import connected_components, pagerank, triangle_count
from tests.conftest import edges_df
from tests.graphs import components_oracle, pagerank_oracle, triangles_oracle

# one shared edge-list strategy: up to 12 vertices, up to 30 directed edges
edge_lists = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=30,
).map(lambda ps: [(f"n{a}", f"n{b}") for a, b in ps])


@settings(max_examples=8, deadline=None)
@given(pairs=edge_lists)
def test_cc_matches_union_find(spark, pairs):
    res = connected_components(spark, edges_df(spark, pairs))
    got = {r["id"]: r["component"] for r in res.vertices.collect()}
    assert got == components_oracle(pairs)


@settings(max_examples=6, deadline=None)
@given(pairs=edge_lists)
def test_triangles_match_counting(spark, pairs):
    total, _ = triangles_oracle(pairs)
    got = triangle_count(edges_df(spark, pairs)).collect()[0]["n_triangles"]
    assert got == total


@settings(max_examples=4, deadline=None)
@given(pairs=edge_lists)
def test_pagerank_k2_matches_oracle(spark, pairs):
    res = pagerank(spark, edges_df(spark, pairs), tol=0.0, max_iter=2)
    got = {r["id"]: r["rank"] for r in res.vertices.collect()}
    want = pagerank_oracle(pairs, k=2)
    assert set(got) == set(want)
    for v in want:
        assert np.isclose(got[v], want[v], atol=1e-12), v


@settings(max_examples=6, deadline=None)
@given(pairs=edge_lists)
def test_cc_star_matches_union_find(spark, pairs):
    from pregel_spark.graph import connected_components_star

    res = connected_components_star(spark, edges_df(spark, pairs))
    got = {r["id"]: r["component"] for r in res.vertices.collect()}
    assert got == components_oracle(pairs)
