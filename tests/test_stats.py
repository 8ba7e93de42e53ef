"""Exact bisection quantiles + power-law MLE — pure-Python oracles."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pregel_spark.pipeline import exact_quantiles, quantile_bins, quantile_table
from pregel_spark.graph import powerlaw_alpha
from tests.conftest import edges_df

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)


def _py_quantiles(vals, qs):
    s = sorted(vals)
    n = len(s)
    return [(q, s[min(max(int(math.ceil(q * n)), 1), n) - 1]) for q in qs]


def test_exact_quantiles_random(spark):
    rng = np.random.default_rng(3)
    vals = [int(v) for v in rng.integers(-1000, 10**7, size=5000)]
    vals += [vals[0]] * 137  # heavy duplicate mass
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    assert exact_quantiles(df, "x", QS) == _py_quantiles(vals, QS)


def test_exact_quantiles_constant_and_single(spark):
    df = spark.createDataFrame([(7,)] * 40, "x long")
    assert exact_quantiles(df, "x", (0.5, 1.0)) == [(0.5, 7), (1.0, 7)]
    one = spark.createDataFrame([(-3,)], "x long")
    assert exact_quantiles(one, "x", (0.01,)) == [(0.01, -3)]


def test_exact_quantiles_validation(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", (0.0,))
    empty = df.filter("x > 99")
    with pytest.raises(ValueError):
        exact_quantiles(empty, "x", (0.5,))


def test_quantile_table_and_bins(spark):
    df = spark.createDataFrame([(v,) for v in range(1, 101)], "x long")
    t = {r["q"]: r["value"] for r in quantile_table(df, "x", (0.25, 0.5)).collect()}
    assert t == {0.25: 25, 0.5: 50}
    b = quantile_bins(df, "x", [25, 50, 75])
    got = {r["x"]: r["bin"] for r in b.collect()}
    assert got[10] == 0 and got[25] == 0 and got[26] == 1
    assert got[75] == 2 and got[76] == 3 and got[100] == 3
    with pytest.raises(ValueError):
        quantile_bins(df, "x", [50, 25])


def test_powerlaw_alpha_matches_python(spark):
    # star-ish graph: hub h cited by everyone, plus a chain
    pairs = [(f"v{i}", "h") for i in range(20)]
    pairs += [(f"v{i}", f"v{i+1}") for i in range(19)]
    pairs += [("h", "v0"), ("h", "v1"), ("h", "v2")]
    df = edges_df(spark, pairs)
    got = {
        r["kind"]: (r["n_tail"], round(r["alpha"], 6))
        for r in powerlaw_alpha(df, dmin=2).collect()
    }
    # python replay
    out_deg, in_deg = {}, {}
    for a, b in pairs:
        out_deg[a] = out_deg.get(a, 0) + 1
        in_deg[b] = in_deg.get(b, 0) + 1
    ids = set(out_deg) | set(in_deg)

    def fit(deg):
        tail = [deg.get(i, 0) for i in ids if deg.get(i, 0) >= 2]
        return (
            len(tail),
            round(1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail), 6),
        )

    assert got == {"in": fit(in_deg), "out": fit(out_deg)}
    with pytest.raises(ValueError):
        powerlaw_alpha(df, dmin=0)


def test_powerlaw_alpha_empty_tail(spark):
    df = edges_df(spark, [("a", "b"), ("c", "d")])
    rows = {r["kind"]: r for r in powerlaw_alpha(df, dmin=5).collect()}
    assert rows["in"]["n_tail"] == 0 and rows["in"]["alpha"] is None
