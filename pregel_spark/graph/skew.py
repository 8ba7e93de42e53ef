"""Skew mitigation: salted two-phase aggregation for hub keys.

The reference has no skew handling — a hub vertex simply makes one
worker's inbox huge (consistent-hash placement, ``pregel/mpool.lua:
29-42``). At web scale, Zipfian in-degree makes ``groupBy(dst)`` hot.

Two distinct cases (SURVEY.md §4):

1. *Algebraic* aggregates (sum/max/min/count): Spark's partial
   aggregation already collapses each map partition to one row per key,
   so a reducer receives at most #map-partitions rows per key — salting
   adds nothing. We use plain ``groupBy.agg`` there.
2. *Holistic* aggregates (``collect_list`` — the generic tier's
   no-combiner inbox): partial aggregation does NOT reduce row count,
   so a hub key concentrates all its messages in one reduce task.
   ``salted_collect_list`` splits each hot key into ``buckets``
   sub-keys (deterministic hash of the payload), partially collects,
   then flattens — two shuffles, each balanced.

``hot_keys`` (e.g. vertices above an in-degree threshold from the
degree table) restricts the two-phase path to keys that need it; cold
keys take the direct single-shuffle path and the two are unioned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salt_expr(payload_col: str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from the payload (not rand():
    reruns and resumed runs must shuffle identically)."""
    return F.pmod(F.xxhash64(F.col(payload_col)), F.lit(buckets)).cast("int")


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: str,
    buckets: int = 16,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """collect_list(value) per key with hub-safe two-phase shuffle.

    Returns (key, <value>s array). Order within the list is not defined
    (matches Spark's collect_list contract; the reference's inbox order
    is likewise unspecified, ``pregel/queue.lua:13-23``).
    """
    out_col = f"{value}s"
    if hot_keys is None:
        salted = df.withColumn("_salt", salt_expr(value, buckets))
        partial = salted.groupBy(key, "_salt").agg(
            F.collect_list(value).alias("_part")
        )
        return partial.groupBy(key).agg(
            F.flatten(F.collect_list("_part")).alias(out_col)
        )
    hk = hot_keys.select(F.col(hot_keys.columns[0]).alias(key)).distinct()
    flagged = df.join(F.broadcast(hk.withColumn("_hot", F.lit(True))), key, "left")
    hot = flagged.filter(F.col("_hot").isNotNull()).drop("_hot")
    cold = flagged.filter(F.col("_hot").isNull()).drop("_hot")
    hot_agg = salted_collect_list(hot, key, value, buckets, hot_keys=None)
    cold_agg = cold.groupBy(key).agg(F.collect_list(value).alias(out_col))
    return hot_agg.unionByName(cold_agg)


def salted_sum(
    df: DataFrame, key: str, value: str, buckets: int = 16
) -> DataFrame:
    """Two-phase salted sum — provided for parity tests and for engines
    where partial aggregation is disabled; semantically identical to
    ``groupBy(key).sum(value)``."""
    salted = df.withColumn("_salt", salt_expr(value, buckets))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_part"))
    return partial.groupBy(key).agg(F.sum("_part").alias(f"sum_{value}"))
