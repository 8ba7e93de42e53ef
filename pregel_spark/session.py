"""SparkSession factory with scale-minded defaults.

All knobs that matter for the BSP loop at cluster scale are set here so
tests, bench, and the driver contract share one configuration story:

- AQE on (runtime coalescing + skew-join splitting),
- shuffle partitions sized to cores locally (on a real cluster this
  would be ~2-3x total executor cores; AQE coalesces down),
- Arrow enabled for the pandas-UDF extraction tier,
- UTC session timezone so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pregel_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``; pass e.g.
    ``local[8]`` for the scaling-efficiency protocol (BASELINE.md). On a
    real cluster this function is a no-op passthrough to spark-submit's
    session (master/em already set), because ``getOrCreate`` reuses it.
    """
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    elif master.startswith("local[") and master != "local[*]":
        cpus = int(master[len("local[") : -1])
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/pregel_spark_warehouse"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # SPARK_GRAFT_LOCAL_DIR: where shuffle/spill blocks land. The
    # single-host scaling proxy can point this at tmpfs (/dev/shm) to
    # model a cluster where every added executor brings its own
    # disk/network bandwidth — on one box all cores share one block
    # device, which caps shuffle-bound loops regardless of cores.
    if os.environ.get("SPARK_GRAFT_LOCAL_DIR"):
        b = b.config("spark.local.dir", os.environ["SPARK_GRAFT_LOCAL_DIR"])
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
