"""Streaming operators driven with availableNow; oracle = the batch
equivalent over the same files (pregel_spark/streaming.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pregel_spark.streaming import (
    EVENTS_SCHEMA,
    read_event_stream,
    run_stream_to_memory,
    sessionize,
    windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, tmp_path):
    rows = []
    eid = 0
    for u in (1, 2):
        # session 1: 3 events 10 min apart; gap 2h; session 2: 2 events
        for m in (0, 10, 20, 140, 150):
            rows.append(
                (eid, T0 + dt.timedelta(minutes=m), u, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    path = str(tmp_path / "events_stream")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return path, df


def test_windowed_counts_matches_batch(spark, tmp_path):
    path, batch = _mk_events(spark, tmp_path)
    stream = read_event_stream(spark, path)
    assert stream.isStreaming
    run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["tv"])
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    }
    assert got == want


def test_sessionize_closed_sessions(spark, tmp_path):
    path, _ = _mk_events(spark, tmp_path)
    stream = read_event_stream(spark, path)
    run_stream_to_memory(sessionize(stream), "sessions", mode="append")
    rows = spark.table("sessions").collect()
    # per user: first session (0,10,20 min) closes when the 140-min event
    # arrives; the trailing session stays open (no emission)
    got = {
        (r["user_id"]): (r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in rows
    }
    assert set(got) == {1, 2}
    for u in (1, 2):
        s, e, n, tv = got[u]
        assert s == T0 and e == T0 + dt.timedelta(minutes=20)
        assert n == 3 and tv == pytest.approx(3.0)


def test_dedup_stream_drops_in_horizon_duplicates(spark, tmp_path):
    from pregel_spark.streaming import dedup_stream

    rows = [
        (1, T0, 7, "click", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=5), 7, "click", 1.0, "{}"),   # dup in horizon
        (2, T0 + dt.timedelta(minutes=1), 7, "view", 2.0, "{}"),
        (2, T0 + dt.timedelta(minutes=2), 8, "view", 2.5, "{}"),    # dup in horizon
        (3, T0 + dt.timedelta(minutes=3), 9, "click", 3.0, "{}"),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    path = str(tmp_path / "dup_stream")
    df.coalesce(2).write.mode("overwrite").parquet(path)

    stream = read_event_stream(spark, path)
    run_stream_to_memory(
        dedup_stream(stream, watermark="2 hours"), "dedup_sink"
    )
    got = spark.table("dedup_sink").collect()
    assert sorted(r.event_id for r in got) == [1, 2, 3]
    # one row per key survived (first arrival; arrival order within one
    # availableNow batch is engine-chosen, so assert uniqueness not which)
    assert len(got) == len({r.event_id for r in got})
