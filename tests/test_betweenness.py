"""Bounded-depth k-source Brandes betweenness vs a pure-Python
Brandes implementation."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest

from pregel_spark.graph import betweenness


def _py_brandes(pairs, sources, max_depth):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        preds = defaultdict(list)
        for v in dist:
            for w in adj[v]:
                if w in dist and dist[w] == dist[v] + 1:
                    preds[w].append(v)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v, dl in delta.items():
            if v != s:
                bc[v] += dl
    return {v: x for v, x in bc.items() if x != 0.0}


def _run(spark, pairs, sources, max_depth):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return {
        r.id: r.betweenness
        for r in betweenness(spark, df, sources, max_depth=max_depth).collect()
    }


DIAMOND = [
    ("s", "a"), ("s", "b"), ("a", "t"), ("b", "t"), ("t", "u"),
    ("s", "c"), ("c", "d"), ("d", "u"),
]


def test_single_source_diamond_exact(spark):
    got = _run(spark, DIAMOND, ["s"], max_depth=10)
    want = _py_brandes(DIAMOND, ["s"], 10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    # a and b split the two shortest s->t paths symmetrically:
    # delta = 1/2 * (1 + delta(t)) = 5/6 each, above t's own 2/3
    # (t forwards only 2 of u's 3 shortest paths)
    assert got["a"] == got["b"]
    assert got["a"] == pytest.approx(5 / 6)
    assert got["t"] == pytest.approx(2 / 3)


def test_multi_source_matches_brandes(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"), ("e", "d"),
        ("d", "f"), ("b", "e"), ("e", "c"), ("f", "a"),
    ]
    sources = ["a", "b", "d", "f"]
    got = _run(spark, pairs, sources, max_depth=8)
    want = _py_brandes(pairs, sources, 8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v


def test_depth_bound_truncates_consistently(spark):
    chain = [(f"n{i}", f"n{i + 1}") for i in range(10)]
    got = _run(spark, chain, ["n0"], max_depth=3)
    want = _py_brandes(chain, ["n0"], 3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    # only n1, n2 are intermediate within 3 hops
    assert set(got) == {"n1", "n2"}


def test_all_sources_exact_on_cycle_graph(spark):
    pairs = [("x", "y"), ("y", "z"), ("z", "x"), ("x", "w"), ("w", "y")]
    nodes = sorted({v for e in pairs for v in e})
    got = _run(spark, pairs, nodes, max_depth=10)
    want = _py_brandes(pairs, nodes, 10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v


def test_betweenness_requires_sources(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        betweenness(spark, df, [])


def test_duplicate_sources_not_double_counted(spark):
    got = _run(spark, DIAMOND, ["s", "s", "s"], max_depth=10)
    want = _py_brandes(DIAMOND, ["s"], 10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
