"""Sessionization and stratified sampling vs pure-Python oracles."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from pregel_spark.pipeline import (
    session_stats,
    sessionize,
    stratified_sample,
    stratified_sample_pred,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, sec):
    return (eid, user, T0 + timedelta(seconds=sec))


EVENTS = [
    # user 1: two sessions (gap 3600 > 1800)
    _ev(0, 1, 0), _ev(1, 1, 100), _ev(2, 1, 1800),
    _ev(3, 1, 1800 + 3601), _ev(4, 1, 1800 + 3700),
    # user 2: single event
    _ev(5, 2, 50),
    # user 3: tie timestamps -> event_id breaks the tie
    _ev(6, 3, 10), _ev(7, 3, 10), _ev(8, 3, 10 + 1801),
]


def _py_sessions(gap=1800):
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, u, ts in EVENTS:
        by_user[u].append((ts, eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        idx, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap:
                idx += 1
            out[eid] = (u, idx)
            prev = ts
    return out


def _df(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, user_id long, ts timestamp"
    )


def test_sessionize_matches_python(spark):
    got = {
        r.event_id: (r.user_id, r.session_idx)
        for r in sessionize(_df(spark)).collect()
    }
    assert got == _py_sessions()
    # the 1800s gap is inclusive (<= stays in session)
    assert got[2][1] == got[0][1]


def test_session_stats(spark):
    rows = {
        (r.user_id, r.session_idx): r
        for r in session_stats(_df(spark)).collect()
    }
    want = _py_sessions()
    from collections import Counter

    n = Counter(want.values())
    assert {k: r.n_events for k, r in rows.items()} == dict(n)
    s11 = rows[(1, 1)]
    assert s11.duration_sec == pytest.approx(1800.0)
    assert rows[(2, 1)].duration_sec == 0.0
    # integer-microsecond bounds
    assert (s11.end_us - s11.start_us) == 1800 * 1_000_000


def test_stratified_sample_deterministic_and_rated(spark):
    import duckdb

    from pregel_spark.pipeline import duckdb_stratified_sample_pred

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rates = {"en": 0.8, "de": 0.2}
    kept = stratified_sample(docs, rates, default_rate=0.05, seed=7)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # engine-portable: DuckDB reproduces the exact member set
    con = duckdb.connect()
    pred = duckdb_stratified_sample_pred(rates, default_rate=0.05, seed=7)
    want = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM '/root/testdata/sf0.01/documents.parquet' "
            f"WHERE {pred} ORDER BY doc_id"
        ).fetchall()
    ]
    assert ids == want
    # layout-invariant: same members after repartitioning
    ids2 = sorted(
        r.doc_id
        for r in stratified_sample(
            docs.repartition(13), rates, default_rate=0.05, seed=7
        ).collect()
    )
    assert ids2 == ids
    # rates actually differ per stratum (en >> de on this corpus)
    by_lang = {
        r.lang: r.cnt
        for r in kept.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    tot = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_lang.get("en", 0) / tot["en"] > 0.6
    assert by_lang.get("de", 0) / tot["de"] < 0.4


def test_stratified_sample_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        stratified_sample_pred({"en": 1.5})
