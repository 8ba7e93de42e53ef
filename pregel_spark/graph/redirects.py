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
self-joined on ``cur``; rounds are bounded by ceil(log2 n)+1 in the
worst case, but the loop exits after ceil(log2 maxchain)+1 rounds
via the newly-resolved test: if NO row resolved this round, every
still-live row is cyclic. Proof: if an acyclic live row sits at
distance d > 2^k after round k, every node on its chain suffix is
itself a redirect source, so rows exist at ALL distances 1..d-1 —
in particular in (2^(k-1), 2^k], and that row resolved this round.
Contrapositive: zero newly-resolved ⇒ no acyclic row remains, and
the remaining live rows can be labeled ``cycle`` immediately (a
bare live==0 test never fires on a cyclic input and would run the
full log2(n) bound — measured 15 rounds instead of 5 at sf0.1). No
driver-side iteration over rows — the only driver scalars are the
row count and one tiny per-round (live, newly-resolved) aggregate
over the checkpointed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import bsp_loop_confs, materialize


def resolve_redirects(
    spark: SparkSession,
    redirects: DataFrame,
    num_partitions: int | None = None,
    max_rounds: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve every redirect source to (src, final_url, n_hops,
    status) — see module docstring for semantics.

    ``max_rounds`` overrides the automatic ceil(log2 n)+1 round bound
    (a testing / budget escape hatch). With a truncated budget, chains
    longer than 2^max_rounds are still live at exit and are reported
    as ``cycle`` — the resolver never emits a wrong terminal or hop
    count, but a truncated run can over-report cycles. Leave it None
    for exact classification. ``stats``, when a dict, receives
    ``{'rounds': <doubling rounds actually run>}`` — the tests pin the
    early-exit round count with it."""
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    m = (
        redirects.select("src", "dst")
        .groupBy("src")
        .agg(F.min("dst").alias("cur"))
    )
    with bsp_loop_confs(spark):
        s = materialize(
            m.withColumn("hops", F.lit(1).cast("long"))
            .withColumn("done", F.lit(False))
            .repartition(n_part, "src")
        )
        n = s.count()
        if n == 0:
            return s.select(
                "src",
                F.col("cur").alias("final_url"),
                F.col("hops").alias("n_hops"),
                F.lit("resolved").alias("status"),
            )
        # worst-case cap: after k rounds every pointer has jumped 2^k,
        # so ceil(log2 n)+1 rounds strictly exceed any acyclic chain
        # length <= n; the newly-resolved exit below fires much earlier
        # (ceil(log2 maxchain)+2 rounds) on real inputs
        rounds = max_rounds if max_rounds is not None else (n - 1).bit_length() + 1
        rounds_run = 0
        for _ in range(rounds):
            rounds_run += 1
            b = s.select(
                F.col("src").alias("cur"),
                F.col("cur").alias("nxt"),
                F.col("hops").alias("h2"),
            )
            j = s.join(b, "cur", "left")
            # done := cur-before-this-jump was a terminal (not a source).
            # The test lags resolution by one round (a row that LANDS on
            # a terminal this round is flagged next round) — that costs
            # one extra round but folds detection into the join the
            # round already pays for, instead of a second join job.
            s = materialize(
                j.select(
                    "src",
                    F.coalesce("nxt", "cur").alias("cur"),
                    F.when(F.col("nxt").isNull(), F.col("hops"))
                    .otherwise(F.col("hops") + F.col("h2"))
                    .alias("hops"),
                    (F.col("nxt").isNull() & ~F.col("done")).alias("newly"),
                    F.col("nxt").isNull().alias("done"),
                ).repartition(n_part, "src")
            )
            # quiescence (module docstring, "newly-resolved test"): zero
            # rows newly done this round proves every still-live row is
            # cyclic — exit and label them; live==0 is the all-resolved
            # special case. One tiny agg over the checkpointed state.
            row = s.agg(
                F.count(F.when(~F.col("done"), 1)).alias("live"),
                F.count(F.when(F.col("newly"), 1)).alias("newly"),
            ).collect()[0]
            if row["live"] == 0 or row["newly"] == 0:
                break
        if stats is not None:
            stats["rounds"] = rounds_run
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
