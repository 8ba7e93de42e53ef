"""Truncated Katz centrality vs a brute-force walk-count DP."""

from __future__ import annotations

import pytest

from pregel_spark.graph import katz_centrality

from conftest import edges_df


def _brute_katz(pairs, alpha, k):
    edges = {(a, b) for a, b in pairs}
    verts = sorted({v for p in edges for v in p})
    cnt = {v: 1 for v in verts}  # walks of length 0 starting anywhere
    katz = {v: 0.0 for v in verts}
    for lvl in range(1, k + 1):
        nxt = {v: 0 for v in verts}
        for a, b in edges:
            nxt[b] += cnt[a]
        cnt = nxt
        # fixed evaluation order (level-major) matches the engine's
        # single-expression polynomial
        for v in verts:
            katz[v] += alpha**lvl * cnt[v]
    return katz


def test_katz_chain(spark):
    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    a = 0.5
    got = {r.id: r.katz for r in katz_centrality(spark, e, alpha=a, k=4).collect()}
    assert got == {
        "a": 0.0,
        "b": a,
        "c": a + a**2,
        "d": a + a**2 + a**3,
    }


def test_katz_two_cycle_counts_all_levels(spark):
    e = edges_df(spark, [("a", "b"), ("b", "a")])
    a = 0.25
    got = {r.id: r.katz for r in katz_centrality(spark, e, alpha=a, k=4).collect()}
    want = a + a**2 + a**3 + a**4
    assert got["a"] == pytest.approx(want)
    assert got["b"] == pytest.approx(want)


def test_katz_matches_brute_force_on_random_graph(spark):
    pairs = [
        (f"v{(i * 11) % 17}", f"v{(i * 13 + 5) % 17}")
        for i in range(60)
        if (i * 11) % 17 != (i * 13 + 5) % 17
    ]
    e = edges_df(spark, pairs)
    got = {r.id: r.katz for r in katz_centrality(spark, e, alpha=0.1, k=4).collect()}
    want = _brute_katz(pairs, 0.1, 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)


def test_katz_duplicate_edges_are_simple_graph(spark):
    e = edges_df(spark, [("a", "b"), ("a", "b"), ("a", "b")])
    got = {r.id: r.katz for r in katz_centrality(spark, e, alpha=0.5, k=3).collect()}
    assert got == {"a": 0.0, "b": 0.5}


def test_katz_rejects_bad_k(spark):
    e = edges_df(spark, [("a", "b")])
    with pytest.raises(ValueError):
        katz_centrality(spark, e, k=0)


def _brute_eigen(pairs, k):
    edges = {(a, b) for a, b in pairs}
    verts = sorted({v for p in edges for v in p})
    cnt = {v: 1 for v in verts}
    for _ in range(k):
        nxt = {v: 0 for v in verts}
        for a, b in edges:
            nxt[b] += cnt[a]
        cnt = nxt
    total = sum(cnt.values())
    return {v: (cnt[v] / total if total else 0.0) for v in verts}


def test_eigenvector_two_cycle_uniform(spark):
    from pregel_spark.graph import eigenvector_centrality

    e = edges_df(spark, [("a", "b"), ("b", "a")])
    got = {r.id: r.score for r in eigenvector_centrality(spark, e, k=4).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_eigenvector_chain_deeper_than_k_is_all_zero(spark):
    # chain of length 3: no walk of length 4 exists -> defined 0.0, not NaN
    from pregel_spark.graph import eigenvector_centrality

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r.id: r.score for r in eigenvector_centrality(spark, e, k=4).collect()}
    assert got == {"a": 0.0, "b": 0.0, "c": 0.0, "d": 0.0}


def test_eigenvector_matches_brute_force_on_random_graph(spark):
    import random

    from pregel_spark.graph import eigenvector_centrality

    rng = random.Random(7)
    pairs = list(
        {
            (f"v{rng.randrange(30)}", f"v{rng.randrange(30)}")
            for _ in range(120)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    e = edges_df(spark, pairs)
    got = {r.id: r.score for r in eigenvector_centrality(spark, e, k=3).collect()}
    want = _brute_eigen(pairs, 3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
