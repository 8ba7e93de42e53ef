"""Structural statistics: clustering coefficient, reciprocity,
assortativity, Adamic-Adar — hand-computed fixtures."""

from __future__ import annotations

import math

import pytest

from pregel_spark.graph import (
    adamic_adar,
    clustering_coefficient,
    degree_assortativity,
    reciprocity,
)

from conftest import edges_df


def test_clustering_coefficient_triangle_with_pendant(spark):
    # triangle a-b-c plus pendant edge c-d
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = {r.id: (r.deg, r.triangles, r.lcc) for r in clustering_coefficient(e).collect()}
    assert got["a"] == (2, 1, 1.0)
    assert got["b"] == (2, 1, 1.0)
    assert got["c"][0] == 3 and got["c"][1] == 1
    assert got["c"][2] == pytest.approx(1.0 / 3.0)
    assert got["d"] == (1, 0, 0.0)


def test_reciprocity_counts_simple_arcs_once(spark):
    # arcs: a->b, b->a, a->c, duplicate a->b, self-loop c->c
    e = edges_df(
        spark, [("a", "b"), ("b", "a"), ("a", "c"), ("a", "b"), ("c", "c")]
    )
    row = reciprocity(e).collect()[0]
    assert row.n_edges == 3
    assert row.n_reciprocal == 2
    assert row.reciprocity == pytest.approx(2.0 / 3.0)


def test_assortativity_star_is_minus_one(spark):
    # star: hub degree 3 vs leaves degree 1 -> perfectly disassortative
    e = edges_df(spark, [("h", "l1"), ("h", "l2"), ("h", "l3")])
    row = degree_assortativity(e).collect()[0]
    assert row.n_pairs == 6
    assert row.assortativity == pytest.approx(-1.0)


def test_adamic_adar_four_cycle(spark):
    # 4-cycle a-b-c-d-a: the two diagonals each share 2 neighbors of
    # degree 2; no other pair has >= 2 common neighbors
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r.u, r.w): (r.n_common, r.aa_score) for r in adamic_adar(e).collect()}
    want_score = 2.0 / math.log(2.0)
    assert set(got) == {("a", "c"), ("b", "d")}
    for n_common, score in got.values():
        assert n_common == 2
        assert score == pytest.approx(want_score)


def test_adamic_adar_center_degree_cutoff(spark):
    # star: leaves share only the hub; excluding the hub as a center
    # removes every candidate pair
    e = edges_df(spark, [("h", f"l{i}") for i in range(4)])
    full = adamic_adar(e, min_common=1, max_center_degree=10).collect()
    assert len(full) == 6  # C(4,2) leaf pairs through the hub
    for r in full:
        assert r.aa_score == pytest.approx(1.0 / math.log(4.0))
    cut = adamic_adar(e, min_common=1, max_center_degree=3).collect()
    assert cut == []
