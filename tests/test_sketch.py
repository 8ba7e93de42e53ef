"""Count-Min + HLL sketches vs bit-exact Python replays and accuracy
bounds on known cardinalities/frequencies."""

from __future__ import annotations

import hashlib

import pytest

from pregel_spark.pipeline import (
    cm_estimate,
    count_min,
    hll_estimate,
    hll_registers,
)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cm_cells(tok, width, depth, seed):
    return [
        (i, _hash60(f"{seed * depth + i}:{tok}") % width) for i in range(depth)
    ]


def items_df(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "token string")


def test_count_min_cells_exact(spark):
    toks = ["a", "b", "a", "c", "a", "b"]
    W, D, S = 32, 3, 0
    got = {
        (r.depth, r.bucket): r.cnt
        for r in count_min(items_df(spark, toks), width=W, depth=D, seed=S).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for t in toks:
        for cell in _cm_cells(t, W, D, S):
            want[cell] = want.get(cell, 0) + 1
    assert got == want


def test_cm_estimate_overcounts_never_under(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    toks = [rng.choice(vocab) for _ in range(3000)] + ["hot"] * 500
    truth: dict[str, int] = {}
    for t in toks:
        truth[t] = truth.get(t, 0) + 1
    sk = count_min(items_df(spark, toks), width=256, depth=4)
    qs = items_df(spark, list(truth))
    est = {r.token: r.est for r in cm_estimate(sk, qs, width=256, depth=4).collect()}
    n = len(toks)
    for t, c in truth.items():
        assert est[t] >= c  # CM never underestimates
        assert est[t] <= c + (2.71828 / 256) * n * 4  # loose eps*N slack
    assert est["hot"] == 500  # heavy hitter: collisions add little here


def test_count_min_weighted(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 5), ("a", 2)], "token string, c int"
    )
    sk = count_min(df, width=64, depth=2, weight_col="c")
    est = {
        r.token: r.est
        for r in cm_estimate(sk, items_df(spark, ["a", "b"]), width=64, depth=2).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 5


def test_hll_registers_exact(spark):
    toks = [f"t{i}" for i in range(50)] * 3  # duplicates change nothing
    B, S = 6, 0
    got = {r.bucket: r.r for r in hll_registers(items_df(spark, toks), b=B, seed=S).collect()}
    want: dict[int, int] = {}
    for t in set(toks):
        h = _hash60(f"{S}:{t}")
        bucket = h % (1 << B)
        rest = h >> B
        rho = min((rest & -rest).bit_length() - 1, 60 - B) + 1 if rest else 60 - B + 1
        want[bucket] = max(want.get(bucket, 0), rho)
    assert got == want


@pytest.mark.parametrize("n", [500, 5000])
def test_hll_estimate_within_tolerance(spark, n):
    df = items_df(spark, [f"u{i}" for i in range(n)])
    est = hll_estimate(hll_registers(df, b=10), b=10)
    # standard error ~ 1.04/sqrt(1024) ~ 3.3%; allow 4 sigma
    assert abs(est - n) / n < 0.13


def test_hll_merge_is_register_max(spark):
    a = items_df(spark, [f"x{i}" for i in range(300)])
    b_ = items_df(spark, [f"x{i}" for i in range(200, 600)])
    ra = hll_registers(a, b=8)
    rb = hll_registers(b_, b=8)
    merged = (
        ra.unionByName(rb).groupBy("bucket").agg({"r": "max"}).withColumnRenamed("max(r)", "r")
    )
    full = hll_registers(a.unionByName(b_), b=8)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
