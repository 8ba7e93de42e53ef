"""Pin the load-bearing materialize() guarantee: a checkpointed
repartition(n, key) must KEEP hashpartitioning metadata even when the
session has AQE enabled (the round-4 finding: AQE-planned
localCheckpoints yield UnknownPartitioning, silently re-exchanging
every loop-static table once per superstep — temporal's 2.4 GB/step).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pregel_spark.graph.engine import materialize


def _partitioning(df):
    return df._jdf.queryExecution().executedPlan().outputPartitioning().toString()


def test_materialize_preserves_repartition_under_aqe(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = spark.range(0, 10000).select(
        (F.col("id") % 100).cast("string").alias("src"),
        F.col("id").alias("v"),
    )
    ck = materialize(df.repartition(8, "src"))
    p = _partitioning(ck)
    assert p.startswith("hashpartitioning(src"), p
    # and the conf is restored
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_materialize_join_reuses_checkpoint_partitioning(spark):
    """A self-join on the checkpointed key must not insert an Exchange
    above the checkpoint scan (the superstep-shaped reuse)."""
    df = spark.range(0, 10000).select(
        (F.col("id") % 100).cast("string").alias("id"),
        F.col("id").alias("v"),
    )
    ck = materialize(df.repartition(8, "id"))
    other = spark.range(0, 100).select(
        F.col("id").cast("string").alias("id"), F.lit(1).alias("w")
    ).repartition(8, "id")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            ck.join(other, "id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
    # exactly one Exchange (the non-checkpointed side); the scan of the
    # checkpointed RDD must join exchange-free
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_materialize_preserves_swp_but_not_global_sort(spark):
    """The unwrap loop in materialize() treats only NON-global Sort
    nodes (sortWithinPartitions) as partitioning-preserving. A global
    orderBy is also a Sort but RANGE-partitions its output — unwrapping
    it would take the AQE-off path on the false premise that
    hashpartitioning survives the checkpoint."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 50).cast("string").alias("k"),
        (F.col("id") % 7).alias("x"),
    )
    swp = materialize(df.repartition(8, "k").sortWithinPartitions("x"))
    part = swp._jdf.queryExecution().logical().outputPartitioning().toString()
    assert "hashpartitioning" in part, part
    srt = materialize(df.repartition(8, "k").orderBy("x"))
    part2 = srt._jdf.queryExecution().logical().outputPartitioning().toString()
    assert "hashpartitioning" not in part2, part2
