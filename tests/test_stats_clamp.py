"""Regression: localCheckpoint stats-squaring (engine._clamp_checkpoint_stats).

Spark 4.1's localCheckpoint carries the pre-checkpoint plan's computed
sizeInBytes into the LogicalRDD leaf; a loop that joins two frames
derived from the same checkpointed state squares that BigInt every
round (bit-width doubles), and ~20 squarings turn one stats multiply
into minutes of driver CPU. The engine clamps the carried stats at
every materialization — this test replays the miniature repro that
went from 14 to 13,123 bits in 9 rounds before the fix.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from pregel_spark.graph.engine import materialize


def _stats_bits(df) -> int:
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()


def test_pointer_doubling_stats_stay_bounded(spark):
    df = spark.range(2000).select(
        F.col("id").alias("c"), (F.col("id") % 7).alias("ptr")
    )
    df = materialize(df)
    t0 = time.monotonic()
    for _ in range(15):
        b = df.select(F.col("c").alias("ptr"), F.col("ptr").alias("nxt"))
        df = materialize(
            df.join(b, "ptr", "left").select(
                "c", F.coalesce("nxt", "ptr").alias("ptr")
            )
        )
        # unclamped, bits double per round (14 -> 13k in 9 rounds);
        # clamped, the carried leaf never exceeds the 64-bit default
        assert _stats_bits(df) <= 64
    assert df.count() == 2000
    # 15 rounds crossed the multiply knee before the fix (minutes);
    # generous bound so steal windows don't flake the suite
    assert time.monotonic() - t0 < 120


def test_clamp_keeps_small_stats_broadcastable(spark):
    small = materialize(
        spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    )
    # real (small) stats are preserved: the checkpointed leaf still
    # reports a sane size rather than the never-broadcast default
    assert _stats_bits(small) <= 64
    big = spark.range(100000).select(F.col("id").alias("k"))
    joined = big.join(small, "k")
    phys = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys
