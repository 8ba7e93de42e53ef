"""Structured Streaming operators over event streams.

The reference is batch-iterative only (SURVEY §2.9) — no watermarks,
event-time windows, or stateful streaming ops. This module supplies
them Spark-first for the events-shaped table ``(event_id, ts, user_id,
event_type, value, props)``:

- ``read_event_stream``: file-source ``readStream`` (at scale: Kafka /
  Iceberg streaming source — same downstream plan);
- ``windowed_event_counts``: event-time tumbling windows with a
  watermark bounding state for late data;
- ``sessionize``: custom stateful operator via
  ``applyInPandasWithState`` — per-user session assembly with a gap
  timeout, the streaming analog of the engine's per-vertex state.

All streaming tests drive these with ``trigger(availableNow=True)``
against file sources, so correctness is asserted against the batch
equivalent on the same data (tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time counts per event_type; watermark bounds the
    state store and admits late rows up to the horizon."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
_STATE_SCHEMA = "start long, end long, n int, total double"


def _session_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionization: events within ``gap`` seconds of the
    previous event extend the session; a larger gap (or state timeout)
    closes it and emits one row."""
    gap_s = 30 * 60
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
        return
    rows = pd.concat(list(pdfs)).sort_values("ts")
    out = []
    if state.exists:
        start, end, n, total = state.get
    else:
        start = end = None
        n, total = 0, 0.0
    for ts, value in zip(rows["ts"], rows["value"]):
        us = int(ts.value // 1000)  # ns -> us
        if start is None:
            start, end, n, total = us, us, 1, float(value)
        elif us - end <= gap_s * 1_000_000:
            end = max(end, us)
            n += 1
            total += float(value)
        else:
            out.append((start, end, n, total))
            start, end, n, total = us, us, 1, float(value)
    state.update((start, end, n, total))
    state.setTimeoutDuration(gap_s * 1000)
    if out:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in out],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in out],
                "n_events": [n_ for *_, n_, _t in out],
                "total_value": [t for *_, t in out],
            }
        )


def sessionize(events: DataFrame) -> DataFrame:
    """Per-user gap sessionization (30-min gap) as a custom stateful
    streaming operator. Emits CLOSED sessions only (open sessions flush
    on state timeout)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, mode: str = "append", timeout_sec: int = 120
) -> None:
    """Drive a streaming DF to completion with availableNow into a
    memory sink named ``name`` (test/bench harness).

    Windowed aggregations should use ``mode='complete'`` here: in
    append mode a window only emits once the watermark passes it, which
    never happens within a single availableNow batch.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def dedup_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming-ingest exact dedup: drop rows whose key was already
    seen within the watermark horizon — the streaming analog of
    ``pipeline.dedup.exact_dedup`` (dedup a document/event feed AS it
    lands, e.g. on the content fingerprint ``incremental_exact``
    screens with in batch).

    Plain ``dropDuplicates`` on a stream keeps per-key state FOREVER —
    unusable on an infinite feed; ``dropDuplicatesWithinWatermark``
    bounds the state store to the horizon: a duplicate arriving within
    ``watermark`` of the first sighting is dropped, one arriving after
    the state expired is admitted again (the standard at-least-once
    ingest contract; exactly-once needs the downstream sink's own
    idempotence, e.g. the fingerprint anti-join).

    First arrival wins. State is O(keys seen per horizon), sharded by
    key hash across executors like any stateful op.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
