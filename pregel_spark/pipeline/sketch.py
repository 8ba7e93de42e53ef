"""Mergeable sketch summaries: Count-Min (heavy hitters) and
HLL-style distinct registers.

At 100 TB you do not ship token streams to the driver — you ship a
CONSTANT-SIZE mergeable summary: every executor folds its partition
into a tiny integer table, the shuffle carries ``O(partitions ×
sketch_size)`` partial rows, and the merge is the same associative
aggregate (sum for Count-Min counters, max for HLL registers). That
merge-under-aggregation structure is exactly Spark's map-side partial
agg, so both sketches here are ONE native ``groupBy`` — no custom
accumulators, no Python, no collect until the sketch itself (KBs).

The reference's aggregation layer (combiner squash,
``pregel/vertex.lua`` min/max/sum message combiners — SURVEY §2.4
A1/A2) is the same algebra over vertex messages; these operators apply
it to corpus statistics instead.

Engine portability, as everywhere in this repo: the hash family is the
md5-backed ``hash60`` (``pipeline/hashing.py``), bucket indices are
``pmod``/``%`` on nonnegative 60-bit longs, HLL's ρ is the same
``bit_count((x & -x) - 1)`` trailing-zero trick ``graph/anf.py`` uses
— every sketch cell is an exact BIGINT any engine reproduces
bit-for-bit. Estimation (the only float math) happens driver-side on
the collected, already-tiny sketch.

Count-Min (Cormode-Muthukrishnan '05): d hash rows × w counters;
``count(x)`` is over-estimated by at most ``ε·N`` (ε = e/w) with
probability ``1 - δ`` (δ = e^-d); point query = min over the d cells.
HLL (Flajolet et al. '07, register layout): m = 2^b registers keep the
max trailing-zero count of the non-bucket hash bits; standard
bias-corrected harmonic estimate with the small-range (linear
counting) correction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .hashing import seeded_hash60


def count_min(
    items: DataFrame,
    col: str = "token",
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of the ``col`` value stream: one row per
    non-empty cell, ``(depth, bucket, cnt)`` — rows never touched stay
    implicit zeros (the estimator treats absent cells as 0), so the
    result is at most ``depth × width`` rows regardless of input size.

    ``weight_col``: optional integer column to add per occurrence
    instead of 1 (e.g. pre-aggregated term counts).

    One shuffle: the depth-way explode partial-aggregates map-side to
    ≤ depth·width rows per task before it moves.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.pmod(seeded_hash60(seed * depth + i, F.col(col)), F.lit(width))
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    return (
        items.select(F.explode(cells).alias("c"), w.alias("_w"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str = "token",
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Point-query the sketch: ``(col, est)`` per query row, where
    ``est = min over d rows of the addressed counter`` (0 when a cell
    was never touched). ``width``/``depth``/``seed`` must match the
    ``count_min`` call. The sketch side is depth×width rows — Spark's
    AQE broadcasts it; queries stream by."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.pmod(seeded_hash60(seed * depth + i, F.col(col)), F.lit(width))
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    q = queries.select(F.col(col), F.explode(cells).alias("c")).select(
        col, F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket")
    )
    return (
        q.join(F.broadcast(sketch), ["depth", "bucket"], "left_outer")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("est"))
    )


def hll_registers(
    items: DataFrame,
    col: str = "token",
    b: int = 10,
    seed: int = 0,
) -> DataFrame:
    """HLL register table of the distinct ``col`` values: ``(bucket,
    r)`` with ``bucket`` the low ``b`` hash bits and ``r`` the max over
    the bucket's values of (trailing zeros of the remaining bits + 1).
    At most ``2^b`` rows; buckets no value hit stay implicit (r = 0 to
    the estimator). Merging two corpora's registers = groupBy max —
    the same aggregate that built them.

    One shuffle with map-side max partials; Spark's own
    ``approx_count_distinct`` is the JVM-tuned alternative when
    cross-engine verifiability doesn't matter (its HLL++ hash is not
    reproducible outside Spark — same trade as ``hashing.py``).
    """
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    h = seeded_hash60(seed, F.col(col))
    rho = F.expr(
        f"CAST(least(bit_count(((shiftright(__h, {b})) & -(shiftright(__h, {b}))) - 1),"
        f" {60 - b}) + 1 AS INT)"
    )
    return (
        items.select(h.alias("__h"))
        .select(
            F.expr(f"CAST(__h % {1 << b} AS INT)").alias("bucket"),
            rho.alias("r"),
        )
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(registers: DataFrame, b: int = 10) -> float:
    """Bias-corrected HLL cardinality from a register table (collected
    driver-side — it is ≤ 2^b rows by construction). Standard
    ``α_m · m² / Σ 2^-r`` with the linear-counting small-range
    correction when the raw estimate is below 2.5·m."""
    m = 1 << b
    regs = {r["bucket"]: r["r"] for r in registers.collect()}
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est
