"""Deterministic Jones-Plassmann coloring: properness + Δ+1 bound +
exact parity vs a pure-Python replay of the same portable-hash rounds.
"""

from __future__ import annotations

import hashlib
import random

from pregel_spark.graph.coloring import greedy_coloring

from tests.conftest import edges_df


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_jp(pairs, seed=0, rounds=None):
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    all_v = {x for e in pairs for x in e}
    out = {v: (0, 0) for v in all_v - set(adj)}
    live = set(adj)
    pri = {v: (_h60(f"{seed}:{v}"), v) for v in all_v}
    rnd = 0
    while live and (rounds is None or rnd < rounds):
        rnd += 1
        win = {v for v in live if all(pri[v] > pri[n] for n in adj[v] if n in live)}
        for v in sorted(win):
            used = {out[n][0] for n in adj[v] if n in out}
            c = 0
            while c in used:
                c += 1
            out[v] = (c, rnd)
        live -= win
    return out


def rand_pairs(seed, n=40, m=90):
    rng = random.Random(seed)
    return [
        (f"v{rng.randrange(n)}", f"v{rng.randrange(n)}") for _ in range(m)
    ] + [("lone", "lone")]


def _run(spark, pairs, **kw):
    return {
        r.id: (r.color, r.round)
        for r in greedy_coloring(spark, edges_df(spark, pairs), **kw).collect()
    }


def test_matches_python_replay_and_is_proper(spark):
    for seed in (0, 3):
        pairs = rand_pairs(seed)
        got = _run(spark, pairs, seed=1)
        want = _py_jp(pairs, seed=1)
        assert got == want, seed
        # properness + Delta+1 bound
        adj = {}
        for a, b in pairs:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        for v, ns in adj.items():
            assert all(got[v][0] != got[n][0] for n in ns)
            assert got[v][0] <= len(ns)


def test_fixed_rounds_partial(spark):
    pairs = rand_pairs(5)
    got = _run(spark, pairs, seed=0, rounds=2)
    want = _py_jp(pairs, seed=0, rounds=2)
    assert got == want
    assert len(got) < len({x for e in pairs for x in e})  # genuinely partial


def test_path_graph_within_delta_plus_one(spark):
    # greedy JP is not optimal (a path may take 3 colors), but it must
    # stay within Delta+1 = 3 and match the replay exactly
    pairs = [(f"p{i}", f"p{i+1}") for i in range(30)]
    got = _run(spark, pairs)
    assert set(c for c, _ in got.values()) <= {0, 1, 2}
    assert got == _py_jp(pairs)


def test_clique_uses_n_colors(spark):
    vs = [f"k{i}" for i in range(5)]
    pairs = [(a, b) for a in vs for b in vs if a < b]
    got = _run(spark, pairs)
    assert sorted(c for c, _ in got.values()) == [0, 1, 2, 3, 4]
