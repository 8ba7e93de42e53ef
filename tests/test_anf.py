"""ANF neighborhood function vs a bit-exact pure-Python FM simulation."""

from __future__ import annotations

import hashlib

from pregel_spark.graph import anf, anf_effective_diameter

from conftest import edges_df

K, CAP, SEED = 4, 24, 0
PHI = 0.77351


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rho(h: int, cap: int) -> int:
    if h == 0:
        return cap
    return min((h & -h).bit_length() - 1, cap)


def _lowest_zero(s: int) -> int:
    t = ~s & ((1 << 64) - 1)
    return (t & -t).bit_length() - 1


def _simulate(pairs, rounds, k=K, cap=CAP, seed=SEED):
    """Exact replay of the sketch recurrence; returns per-round sum_pow2b."""
    edges = {(a, b) for a, b in pairs}
    verts = sorted({v for p in edges for v in p})
    sk = {
        v: [1 << _rho(_hash60(f"{seed * k + i}:{v}"), cap) for i in range(k)]
        for v in verts
    }
    out = [sum(1 << _lowest_zero(b) for bs in sk.values() for b in bs)]
    for _ in range(rounds):
        nxt = {v: list(bs) for v, bs in sk.items()}
        for a, b in edges:
            for i in range(k):
                nxt[a][i] |= sk[b][i]
        sk = nxt
        out.append(sum(1 << _lowest_zero(b) for bs in sk.values() for b in bs))
    return out


def _run(spark, pairs, rounds):
    got = anf(
        spark, edges_df(spark, pairs), rounds=rounds, k=K, cap=CAP, seed=SEED
    ).collect()
    return {r["round"]: (r["sum_pow2b"], r["reach_est"]) for r in got}


def test_anf_path_exact(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    want = _simulate(pairs, 4)
    got = _run(spark, pairs, 4)
    assert sorted(got) == [0, 1, 2, 3, 4]
    for t, w in enumerate(want):
        s, est = got[t]
        assert s == w, f"round {t}"
        assert est == w / (K * PHI)


def test_anf_star_and_saturation(spark):
    # hub -> 6 leaves (directed): hub's ball saturates at round 1,
    # leaves never grow — N(t) constant for t >= 1
    pairs = [("hub", f"l{i}") for i in range(6)]
    want = _simulate(pairs, 3)
    got = _run(spark, pairs, 3)
    for t, w in enumerate(want):
        assert got[t][0] == w
    assert got[1][0] == got[2][0] == got[3][0]


def test_anf_monotone_and_diameter(spark):
    # two directed cycles bridged: reach grows for several rounds
    pairs = (
        [(f"c{i}", f"c{(i + 1) % 5}") for i in range(5)]
        + [(f"d{i}", f"d{(i + 1) % 4}") for i in range(4)]
        + [("c0", "d0")]
    )
    nf = anf(spark, edges_df(spark, pairs), rounds=6, k=K, cap=CAP)
    rows = sorted(nf.collect(), key=lambda r: r["round"])
    ests = [r["reach_est"] for r in rows]
    assert all(a <= b for a, b in zip(ests, ests[1:]))  # balls only grow
    d = anf_effective_diameter(nf, q=0.9)
    assert 0 < d <= 6
    want = _simulate(pairs, 6)
    assert [r["sum_pow2b"] for r in rows] == want
