"""Salted two-phase aggregation == plain aggregation (skew.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pregel_spark.graph.skew import salted_collect_list, salted_sum


def _msgs(spark, n=2000, hot_frac=0.5, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        key = "hub" if rng.random() < hot_frac else f"k{int(rng.integers(0, 20))}"
        rows.append((key, float(rng.integers(1, 100))))
    return spark.createDataFrame(rows, "id string, msg double")


def test_salted_collect_list_matches_plain(spark):
    df = _msgs(spark)
    plain = {
        r["id"]: sorted(r["msgs"])
        for r in df.groupBy("id").agg(F.collect_list("msg").alias("msgs")).collect()
    }
    for hot in (None, spark.createDataFrame([("hub",)], "id string")):
        got = {
            r["id"]: sorted(r["msgs"])
            for r in salted_collect_list(df, "id", "msg", buckets=8, hot_keys=hot).collect()
        }
        assert got == plain


def test_salted_sum_matches_plain(spark):
    df = _msgs(spark)
    plain = {r["id"]: r["s"] for r in df.groupBy("id").agg(F.sum("msg").alias("s")).collect()}
    got = {r["id"]: r["sum_msg"] for r in salted_sum(df, "id", "msg", buckets=8).collect()}
    assert set(got) == set(plain)
    for k in plain:
        assert np.isclose(got[k], plain[k])
