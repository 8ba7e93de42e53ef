"""Redirect-chain resolution (pointer doubling) vs a pure-Python
chain walker."""

from __future__ import annotations

import pytest

from pregel_spark.graph import resolve_redirects


def _py_resolve(pairs):
    m = {}
    for s, d in pairs:
        m[s] = min(m[s], d) if s in m else d
    out = {}
    for s in m:
        cur, hops, seen = m[s], 1, {s}
        while cur in m:
            if cur in seen:
                out[s] = (None, None, "cycle")
                break
            seen.add(cur)
            cur = m[cur]
            hops += 1
        else:
            out[s] = (cur, hops, "resolved")
    return out


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return {
        r.src: (r.final_url, r.n_hops, r.status)
        for r in resolve_redirects(spark, df, **kw).collect()
    }


def test_chains_cycles_conflicts(spark):
    pairs = [
        # plain chain a->b->c->T
        ("a", "b"), ("b", "c"), ("c", "T"),
        # conflicting records: min(dst) wins deterministically
        ("x", "q"), ("x", "m"),  # x -> m
        ("m", "T2"),
        # self-redirect
        ("loop", "loop"),
        # 3-cycle plus a tail entering it
        ("c1", "c2"), ("c2", "c3"), ("c3", "c1"), ("tail", "c1"),
    ]
    got = _run(spark, pairs)
    assert got == _py_resolve(pairs)
    assert got["a"] == ("T", 3, "resolved")
    assert got["x"] == ("T2", 2, "resolved")
    assert got["loop"] == (None, None, "cycle")
    assert got["tail"] == (None, None, "cycle")


def test_long_chain_log_rounds(spark):
    # 100-hop chain: resolves in ceil(log2 100)+1 = 8 doubling rounds,
    # exact hop counts the whole way down
    pairs = [(f"u{i}", f"u{i + 1}") for i in range(100)]
    got = _run(spark, pairs)
    assert got == _py_resolve(pairs)
    assert got["u0"] == ("u100", 100, "resolved")
    assert got["u99"] == ("u100", 1, "resolved")


def test_lone_long_chain_with_cycle_not_misclassified(spark):
    # regression: a flat live-count (one long chain + one cycle) must
    # NOT be treated as all-cycles; the resolver runs its log bound
    pairs = [(f"v{i}", f"v{i + 1}") for i in range(40)] + [
        ("ca", "cb"), ("cb", "ca"),
    ]
    got = _run(spark, pairs)
    assert got == _py_resolve(pairs)
    assert got["v0"] == ("v40", 40, "resolved")
    assert got["ca"] == (None, None, "cycle")


def test_cycles_exit_in_one_round(spark):
    # pure-cycle input: round 1 resolves nobody, which PROVES every
    # live row is cyclic (module docstring) — exit after 1 round, not
    # the ceil(log2 n)+1 cap
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("z", "z")]
    stats = {}
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        r.src: (r.final_url, r.n_hops, r.status)
        for r in resolve_redirects(spark, df, stats=stats).collect()
    }
    assert got == _py_resolve(pairs)
    assert stats["rounds"] == 1


def test_early_exit_scales_with_chain_not_n(spark):
    # 3000 length-3 chains + one 3-cycle: the worst-case cap is
    # ceil(log2 9003)+1 = 15 rounds, but zero-newly-resolved fires at
    # round 4 (d<=3 rows all done by round 3, detected lagged +1)
    pairs = [
        (f"c{i}_{j}", f"c{i}_{j + 1}") for i in range(3000) for j in range(3)
    ] + [("r1", "r2"), ("r2", "r3"), ("r3", "r1")]
    stats = {}
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        r.src: (r.final_url, r.n_hops, r.status)
        for r in resolve_redirects(spark, df, stats=stats).collect()
    }
    assert got == _py_resolve(pairs)
    assert stats["rounds"] == 4


def test_empty_input(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert resolve_redirects(spark, df).collect() == []


def test_insufficient_rounds_flag_as_cycle_only_with_override(spark):
    # max_rounds is an explicit escape hatch: with too few rounds the
    # unresolved tail is reported as cycle (documented), never wrong hops
    pairs = [(f"w{i}", f"w{i + 1}") for i in range(20)]
    got = _run(spark, pairs, max_rounds=2)
    full = _py_resolve(pairs)
    for s, (fu, hops, status) in got.items():
        if status == "resolved":
            assert (fu, hops, status) == full[s]
        else:
            assert status == "cycle"
    assert any(v[2] == "cycle" for v in got.values())
