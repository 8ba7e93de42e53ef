"""Deterministic Spark-native synthetic edge-table generator.

For scaling benchmarks the testdata-derived graphs are too small: at
sf0.1 each of 32 cores sees ~19k edges per superstep and fixed
per-superstep overhead dominates, so core scaling cannot show. This
generator builds an arbitrarily large power-law-ish web graph entirely
with native expressions (``spark.range`` + hash arithmetic — no data
movement, no Python), seeded and reproducible, written once to parquet
and shared by all parallelism levels (BASELINE.md protocol: "identical
input edge table").

Degree model: source vertices drawn uniformly; destinations drawn from
a mixture of uniform and a Zipf-like popularity ramp (hub mass on low
vertex ids) — mirroring the corpus generator's preferential attachment
(corpus.py) at scale, so hub skew is present in the bench graph.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def synth_edges(
    spark: SparkSession,
    n_edges: int = 20_000_000,
    n_vertices: int | None = None,
    hub_fraction: float = 0.2,
    n_hubs: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Edge table (src string, dst string, weight double), deduped.

    ~``hub_fraction`` of edges point at one of ``n_hubs`` hub vertices;
    the rest are uniform. Self-loops dropped.
    """
    if n_vertices is None:
        n_vertices = max(1000, n_edges // 20)
    e = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(n_vertices)).alias("s"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n_vertices)).alias("du"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(n_hubs)).alias("dh"),
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(1000)) / 1000.0
        ).alias("r"),
    )
    dst = F.when(F.col("r") < hub_fraction, F.col("dh")).otherwise(F.col("du"))
    return (
        e.select(
            F.concat(F.lit("v"), F.col("s")).alias("src"),
            F.concat(F.lit("v"), dst).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def ensure_synth_edges_parquet(
    spark: SparkSession,
    path: str,
    n_edges: int = 20_000_000,
    **kwargs,
) -> str:
    """Write the synthetic edge table once (idempotent by _SUCCESS)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_edges(spark, n_edges, **kwargs).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path
