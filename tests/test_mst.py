"""Borůvka minimum spanning forest vs a Kruskal union-find oracle
using the identical (weight, u, w) total order."""

from __future__ import annotations

import pytest

from pregel_spark.graph import minimum_spanning_forest


def wedges_df(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, weight double")


def _kruskal(triples):
    """Forest edges {(u, w, weight)} under the same canonicalization
    and tie-broken total order as the engine."""
    best = {}
    for a, b, wt in triples:
        if a == b or wt is None:
            continue
        u, w = min(a, b), max(a, b)
        if (u, w) not in best or wt < best[(u, w)]:
            best[(u, w)] = float(wt)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (u, w), wt in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rw = find(u), find(w)
        if ru != rw:
            parent[ru] = rw
            forest.add((u, w, wt))
    return forest


def _run(spark, triples):
    res = minimum_spanning_forest(spark, wedges_df(spark, triples))
    assert res.converged
    got = {(r.u, r.w, r.weight) for r in res.vertices.collect()}
    want = _kruskal(triples)
    assert got == want
    assert res.aggregates["n_edges"] == len(want)
    assert res.aggregates["total_weight"] == pytest.approx(
        sum(wt for _, _, wt in want)
    )
    return res


def test_mst_triangle_drops_heaviest(spark):
    res = _run(
        spark, [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 3.0)]
    )
    got = {(r.u, r.w) for r in res.vertices.collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_mst_parallel_edges_and_self_loops(spark):
    _run(
        spark,
        [
            ("a", "b", 5.0),
            ("b", "a", 2.0),  # cheaper parallel copy (reversed)
            ("a", "a", 0.1),  # self-loop ignored
            ("b", "c", 1.0),
        ],
    )


def test_mst_disconnected_graph_is_a_forest(spark):
    res = _run(
        spark,
        [
            ("a", "b", 1.0),
            ("b", "c", 4.0),
            ("a", "c", 2.0),
            ("x", "y", 7.0),
            ("y", "z", 3.0),
            ("x", "z", 5.0),
        ],
    )
    assert res.aggregates["n_edges"] == 4  # 2 per component


def test_mst_equal_weights_tie_broken_by_pair(spark):
    # every edge weight 1.0: the forest is still deterministic — the
    # (weight, u, w) order makes Kruskal and Boruvka agree exactly
    tri = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0),
           ("c", "d", 1.0), ("b", "d", 1.0)]
    _run(spark, tri)


def test_mst_random_graph_multiround(spark):
    # pseudo-random weighted graph large enough to need several
    # Boruvka rounds (long chains force nontrivial pointer doubling)
    tri = []
    n = 40
    for i in range(n - 1):
        tri.append((f"v{i:02d}", f"v{i + 1:02d}", float((i * 37) % 50 + 1)))
    for i in range(0, n - 3, 2):
        tri.append((f"v{i:02d}", f"v{i + 3:02d}", float((i * 53) % 60 + 1)))
    res = _run(spark, tri)
    assert res.aggregates["n_edges"] == n - 1  # connected -> spanning tree
    assert res.supersteps >= 2


def test_mst_empty_edges(spark):
    res = minimum_spanning_forest(spark, wedges_df(spark, []))
    assert res.converged
    assert res.vertices.count() == 0
    assert res.aggregates == {"total_weight": 0.0, "n_edges": 0}
