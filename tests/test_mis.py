"""Deterministic Luby MIS: independence + maximality + determinism
checked against the edge set; exact-set parity vs a pure-Python
replay of the same portable-hash rounds."""

from __future__ import annotations

import hashlib

import pytest

from pregel_spark.graph import maximal_independent_set


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_luby(pairs, seed=0):
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    all_v = {x for e in pairs for x in e}
    mis = {v: 0 for v in all_v - set(adj)}
    live = set(adj)
    rnd = 0
    while live:
        rnd += 1
        pri = {v: (_h60(f"{seed}:{rnd}:{v}"), v) for v in live}
        win = {
            v
            for v in live
            if all(pri[v] < pri[n] for n in adj[v] if n in live)
        }
        for v in win:
            mis[v] = rnd
        dead = set(win)
        for v in win:
            dead |= adj[v] & live
        live -= dead
    return mis


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
    ("e", "f"),                                       # lone edge
    ("g", "g"),                                       # self-loop -> isolated
    ("h", "a"),                                       # pendant
] + [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]  # K5


def test_mis_matches_python_replay_and_invariants(spark):
    df = spark.createDataFrame(PAIRS, ["src", "dst"])
    got = {
        r.id: r.round
        for r in maximal_independent_set(spark, df, seed=0).collect()
    }
    assert got == _py_luby(PAIRS, seed=0)
    sel = set(got)
    adj = {}
    for a, b in PAIRS:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    # independent: no selected pair adjacent
    for v in sel:
        assert not (adj.get(v, set()) & sel), v
    # maximal: every unselected vertex has a selected neighbor
    all_v = {x for e in PAIRS for x in e}
    for v in all_v - sel:
        assert adj.get(v, set()) & sel, v
    # self-loop-only vertex is isolated -> always in (round 0)
    assert got["g"] == 0
    # K5 contributes exactly one member
    assert len(sel & {f"k{i}" for i in range(5)}) == 1


def test_mis_seed_changes_selection_deterministically(spark):
    df = spark.createDataFrame(PAIRS, ["src", "dst"])
    a = {r.id for r in maximal_independent_set(spark, df, seed=1).collect()}
    b = {r.id for r in maximal_independent_set(spark, df, seed=1).collect()}
    assert a == b  # same seed -> identical set
    assert a == set(_py_luby(PAIRS, seed=1))


def test_mis_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert maximal_independent_set(spark, df).collect() == []
