"""k-truss vs a pure-Python peeling oracle."""

from __future__ import annotations

from itertools import combinations

import pytest

from pregel_spark.graph import k_truss


def _py_truss(pairs, k):
    e = set()
    for a, b in pairs:
        if a != b:
            e.add((min(a, b), max(a, b)))
    while True:
        adj = {}
        for u, v in e:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        supp = {
            (u, v): len(adj[u] & adj[v]) for u, v in e
        }
        keep = {p for p in e if supp[p] >= k - 2}
        if keep == e:
            return {p: supp[p] for p in e}
        e = keep


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _k5_k4_bridge():
    # K5 on a..e, K4 on p..s, bridge e-p (FIXTURES.md §6 family)
    k5 = list(combinations("abcde", 2))
    k4 = list(combinations("pqrs", 2))
    return k5 + k4 + [("e", "p")]


def test_truss4_keeps_cliques_drops_bridge(spark):
    pairs = _k5_k4_bridge()
    got = {(r.u, r.v): r.support for r in k_truss(spark, _edges(spark, pairs), k=4).collect()}
    assert got == _py_truss(pairs, 4)
    # bridge edge and nothing else dropped: K5 edges have support 3,
    # K4 edges support 2, bridge 0
    assert ("e", "p") not in got
    assert got[("a", "b")] == 3 and got[("p", "q")] == 2


def test_truss5_drops_k4(spark):
    pairs = _k5_k4_bridge()
    got = {(r.u, r.v): r.support for r in k_truss(spark, _edges(spark, pairs), k=5).collect()}
    assert got == _py_truss(pairs, 5)
    assert set(got) == {(a, b) for a, b in combinations("abcde", 2)}


def test_truss_cascading_peel(spark):
    # triangle chain t0-t1-t2, t1-t2-t3, ...: every edge has support
    # >= 1 initially, but 4-truss (support >= 2) unravels the whole
    # chain from both ends — pure cascade, multiple rounds
    pairs = []
    for i in range(6):
        pairs += [(f"t{i}", f"t{i + 1}"), (f"t{i}", f"t{i + 2}")]
    got = {(r.u, r.v): r.support for r in k_truss(spark, _edges(spark, pairs), k=4).collect()}
    assert got == _py_truss(pairs, 4)


def test_truss_triangle_free_graph_empties(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    assert k_truss(spark, _edges(spark, pairs), k=3).collect() == []


def test_truss_rejects_small_k(spark):
    with pytest.raises(ValueError):
        k_truss(spark, _edges(spark, [("a", "b")]), k=2)


def test_truss_max_rounds_superset(spark):
    pairs = []
    for i in range(6):
        pairs += [(f"t{i}", f"t{i + 1}"), (f"t{i}", f"t{i + 2}")]
    full = set(_py_truss(pairs, 4))
    part = {
        (r.u, r.v)
        for r in k_truss(spark, _edges(spark, pairs), k=4, max_rounds=1).collect()
    }
    assert part >= full
