"""Event sessionization — the gap-based session cut that every web
analytics stack runs over its click/event stream.

An event belongs to the same session as its predecessor iff the gap
to the user's previous event is <= ``gap_sec``; otherwise it starts a
new session. Ordering within a user is pinned to (ts, event_id) so
ties are deterministic in any engine; gaps compare in integer
MICROSECONDS (``unix_micros`` / DuckDB ``epoch_us``) — no float time
arithmetic anywhere.

Scale shape: one shuffle keyed on ``user_id`` (the canonical
sessionization exchange), then two window passes over each user's
partition-local sorted run (lag -> boundary flag, running sum ->
session index) and, for the summary, one partial-agg groupBy on
(user_id, session_idx) that rides the same partitioning. Per-user
event counts bound partition skew — a bot user with 10^8 events is
the known hot key; cap upstream or salt by day if that is real in
your stream. (Structured Streaming's session_window implements the
same cut incrementally; this is the batch/backfill form.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _micros(ts_col: str) -> Column:
    """Integer epoch microseconds. Parquet scans yield TIMESTAMP_NTZ,
    which ``unix_micros`` rejects — the cast interprets NTZ wall time
    in the session timezone, which ``session.get_spark`` pins to UTC
    (so the value equals DuckDB's ``epoch_us`` on the same naive
    timestamp; with a non-UTC session timezone, absolute *_us shift by
    a constant offset while gaps and durations are unaffected)."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Input events + (session_idx, is_session_start): session_idx is
    1-based per user in time order."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _micros(ts_col)
    prev = F.lag(us).over(w)
    is_start = F.when(
        prev.isNull() | ((us - prev) > gap_sec * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("is_session_start", is_start).withColumn(
        "session_idx",
        F.sum("is_session_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup: (user_id, session_idx, n_events,
    start_us, end_us, duration_sec) with duration in float seconds
    derived from the integer microsecond bounds."""
    s = sessionize(events, gap_sec, user_col, ts_col, id_col)
    us = _micros(ts_col)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
        )
        .select(
            user_col,
            "session_idx",
            "n_events",
            "start_us",
            "end_us",
            ((F.col("end_us") - F.col("start_us")) / F.lit(1_000_000.0)).alias(
                "duration_sec"
            ),
        )
    )
