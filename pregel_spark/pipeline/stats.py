"""Exact distributed quantiles by value-domain bisection.

Spark's built-in exact ``percentile`` buffers every value of a group in
executor memory (an ``ObjectHashAggregate`` over collected arrays) and
``approx_percentile`` trades exactness away — neither is the right
shape for "the exact p99 token count of a 100 TB corpus". This module
computes EXACT rank statistics of an integer column with CONSTANT
executor memory: binary-search the value domain, one whole-corpus
conditional-count aggregation per bisection level, all requested
quantiles sharing each pass.

Cost: ``ceil(log2(max - min))`` scans (<= 64 ever; ~20 for token
counts), each a single map-side-combined ``agg`` of ``k`` long sums —
no shuffle wider than one row, no per-group state. Cache the projected
single-column frame when the source is expensive to rescan.

Rank spec (pinned, engine-portable): the q-quantile is the value at
1-indexed rank ``ceil(q * n)`` (clamped to ``[1, n]``) in the sorted
column — the "lower" discrete quantile, matching
``ORDER BY + row_number`` in any SQL engine; no interpolation, so the
result is always a value that occurs in the data and no float
arithmetic touches the result. The only float op is the ``q * n``
product inside ``ceil``, mirrored verbatim in the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def exact_quantiles(
    df: DataFrame, col: str, qs: tuple[float, ...]
) -> list[tuple[float, int]]:
    """Exact (q, value) pairs for an integer column (see module doc)."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile must be in (0, 1], got {q}")
    src = df.select(F.col(col).cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    head = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n, lo0, hi0 = head["n"], head["lo"], head["hi"]
    if n == 0:
        raise ValueError("exact_quantiles: no non-null rows")
    ranks = [min(max(int(math.ceil(q * n)), 1), n) for q in qs]
    # invariant per quantile: count(v <= lo-1) < rank <= count(v <= hi)
    bounds = [[lo0, hi0] for _ in qs]
    while True:
        mids = sorted(
            {(b[0] + b[1]) // 2 for b in bounds if b[0] < b[1]}
        )
        if not mids:
            break
        row = src.agg(
            *[
                F.sum((F.col("v") <= m).cast("long")).alias(f"c{i}")
                for i, m in enumerate(mids)
            ]
        ).collect()[0]
        cnt = {m: row[f"c{i}"] for i, m in enumerate(mids)}
        for b, r in zip(bounds, ranks):
            if b[0] < b[1]:
                m = (b[0] + b[1]) // 2
                if cnt[m] >= r:
                    b[1] = m
                else:
                    b[0] = m + 1
    return [(q, b[0]) for q, b in zip(qs, bounds)]


def quantile_table(
    df: DataFrame, col: str, qs: tuple[float, ...]
) -> DataFrame:
    """``exact_quantiles`` as a (q, value) DataFrame — the distributed
    passes do the work; only the len(qs)-row summary is driver-side
    (the same pattern as the sketch estimators)."""
    spark = df.sparkSession
    rows = exact_quantiles(df, col, qs)
    return spark.createDataFrame(
        [(float(q), int(v)) for q, v in rows], "q double, value long"
    )


def quantile_bins(
    df: DataFrame, col: str, boundaries: list[int], out_col: str = "bin"
) -> DataFrame:
    """Assign each row the index of the first boundary >= its value
    (``len(boundaries)`` for values above all) — the scan-time binning
    step that turns ``exact_quantiles`` output into e.g. length-bucket
    labels for stratified mixes. Zero shuffles; the CASE chain is a
    literal compiled from the (human-sized) boundary list."""
    if boundaries != sorted(boundaries):
        raise ValueError("boundaries must be ascending")
    expr = F.lit(len(boundaries))
    for i in range(len(boundaries) - 1, -1, -1):
        expr = F.when(
            F.col(col).cast("long") <= boundaries[i], F.lit(i)
        ).otherwise(expr)
    return df.withColumn(out_col, expr)
