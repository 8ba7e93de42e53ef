"""Redirect-chain resolution by pointer doubling (path halving).

A crawl emits (src, dst) "src redirects to dst" rows (HTTP 3xx,
canonical link, meta refresh). Downstream link analysis needs every
URL mapped to its TERMINAL target — the page whose content actually
exists — plus the true chain length and a cycle flag (redirect loops
are a real crawl pathology and must not hang the resolver).

The reference engine has no redirect surface (its scope is the BSP
loops, ``pregel/master.lua``); this operator is part of the webtext
extension, and is the repo's pointer-doubling archetype: each round
composes the partial map with itself (``f <- f . f``), so a chain of
length L resolves in ceil(log2 L) rounds — the textbook
list-ranking recurrence (Wyllie), not an O(L) walk. On a 10^12-page
crawl with chains up to ~10^3 hops that is 10 self-join rounds, each
a single equi-join on the loop key.

Semantics (deterministic):
- multiple targets for one src (conflicting crawl records) resolve to
  ``min(dst)`` — a pure function of the input multiset;
- ``status='resolved'``: final_url = unique terminal (a node with no
  outgoing redirect), n_hops = exact chain length;
- ``status='cycle'``: the chain enters a redirect loop (including
  self-redirects); final_url/n_hops are NULL — cycles have no
  terminal, and any representative pick would expose walk order.

Scale: the loop-carried state has one row per redirect SOURCE (far
smaller than the page table), hash-partitioned once on ``src`` and
self-joined on ``cur``; rounds are bounded by ceil(log2 n)+1 with
early exit on quiescence, so a worst-case adversarial input costs
log rounds, never a long tail. No driver-side iteration over rows —
the only driver scalars are the row count and the per-round active
count (the quiescence check every loop in this repo does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import bsp_loop_confs, materialize


def resolve_redirects(
    spark: SparkSession,
    redirects: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Resolve every redirect source to (src, final_url, n_hops,
    status) — see module docstring for semantics.

    ``max_rounds`` overrides the automatic ceil(log2 n)+1 round bound
    (a testing / budget escape hatch). With a truncated budget, chains
    longer than 2^max_rounds are still live at exit and are reported
    as ``cycle`` — the resolver never emits a wrong terminal or hop
    count, but a truncated run can over-report cycles. Leave it None
    for exact classification."""
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    m = (
        redirects.select("src", "dst")
        .groupBy("src")
        .agg(F.min("dst").alias("cur"))
    )
    with bsp_loop_confs(spark):
        s = materialize(
            m.withColumn("hops", F.lit(1).cast("long")).repartition(n_part, "src")
        )
        n = s.count()
        if n == 0:
            return s.select(
                "src",
                F.col("cur").alias("final_url"),
                F.col("hops").alias("n_hops"),
                F.lit("resolved").alias("status"),
            )
        # after k rounds every pointer has jumped 2^k: ceil(log2 n)+1
        # rounds strictly exceed any acyclic chain length <= n
        rounds = max_rounds if max_rounds is not None else (n - 1).bit_length() + 1
        for _ in range(rounds):
            b = s.select(
                F.col("src").alias("cur"),
                F.col("cur").alias("nxt"),
                F.col("hops").alias("h2"),
            )
            j = s.join(b, "cur", "left")
            s = materialize(
                j.select(
                    "src",
                    F.coalesce("nxt", "cur").alias("cur"),
                    F.when(F.col("nxt").isNull(), F.col("hops"))
                    .otherwise(F.col("hops") + F.col("h2"))
                    .alias("hops"),
                ).repartition(n_part, "src")
            )
            # quiescence: a row is live iff cur is still a redirect
            # source. NOTE: a stalled-but-positive live count does NOT
            # prove only cycles remain (a lone long chain keeps the
            # count flat for several rounds while still resolving), so
            # the only sound early exit is zero; the log-round bound
            # caps the cyclic case
            live = s.join(b.select("cur").distinct(), "cur").count()
            if live == 0:
                break
        keys = s.select(F.col("src").alias("cur")).distinct()
        done = F.col("k.cur").isNull()
        return (
            s.join(keys.alias("k"), s["cur"] == F.col("k.cur"), "left")
            .select(
                "src",
                F.when(done, s["cur"]).alias("final_url"),
                F.when(done, F.col("hops")).alias("n_hops"),
                F.when(done, F.lit("resolved"))
                .otherwise(F.lit("cycle"))
                .alias("status"),
            )
        )
