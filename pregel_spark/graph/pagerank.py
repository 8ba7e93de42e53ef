"""PageRank: the flagship native-expression BSP kernel.

Semantics (FIXTURES.md §6, matching the NumPy power-iteration oracle):
damping d=0.85; dangling mass redistributed uniformly; converged when
``max |Δrank| < tol``. Each superstep:

    r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u)  +  DM/N )
    DM    = Σ_{dangling u} r(u)

Spark plan per superstep (see module docstring of engine.py for the
reference mapping):
- scatter join J2: ``links ⋈ ranks`` on ``src`` — both sides hash-
  partitioned on the key with the same partition count, so the
  sort-merge join starts aligned (no extra exchange of the static,
  cached ``links`` side);
- gather+combine A1/J1: ``groupBy(dst).sum(contrib)`` — Catalyst's
  partial aggregation is the map-side combine, which already collapses
  hub skew for algebraic sums (see skew.py for why salting is not
  needed here, and ``use_salted`` to force the two-phase path);
- aggregator A3 (dangling mass) and the convergence test share ONE
  driver action per superstep: ``agg(max(delta), sum(rank WHERE
  dangling))`` — the reference needs a full barrier round-trip for the
  same (``pregel/aggregator.lua``, ``pregel/master.lua:64-75``); that
  action also fills the new ranks' cache, so steady-state supersteps
  are a single Spark job;
- loop-carried ranks are ``localCheckpoint``-ed every superstep:
  the new state references the old state twice (rank update + delta),
  so an uncut plan doubles per iteration — see ``StepMaterializer``
  for the measurement; AQE is disabled inside the loop
  (``bsp_loop_confs``, ~2x per-superstep overhead for zero benefit on
  fixed-shape jobs); parquet snapshots via ``checkpoint_dir`` make
  runs resumable (``pregel/master.lua:101-103``).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tableio import CheckpointManager
from .build import vertices_from_edges
from .engine import (
    PregelResult,
    ShuffleDelta,
    StepMaterializer,
    bsp_loop_confs,
    materialize,
)
from .skew import salted_sum


class PreparedGraph:
    """The static per-run structures PageRank builds before its loop —
    degree-normalized link shares (persisted hash-partitioned on
    ``src``), the vertex set, and the optional numeric-id map — bundled
    so MULTI-RUN consumers (``spam_mass`` runs uniform + personalized
    PageRank over the SAME graph; warm-start recrawl sweeps rerun over
    one snapshot) pay the O(E) dedup/hash/persist setup ONCE. At web
    scale the setup is two full passes over the edge table; sharing it
    halves the fixed cost of every PageRank after the first.

    Callers own the lifecycle: ``release()`` frees the persisted link
    table when the last run is done (``pagerank`` only unpersists links
    it built itself)."""

    def __init__(self, links, outdeg, verts, n, vmap, n_part, weighted):
        self.links = links
        self.outdeg = outdeg
        self.verts = verts
        self.n = n
        self.vmap = vmap
        self.n_part = n_part
        self.weighted = weighted

    def release(self) -> None:
        self.links.unpersist()


def prepare_graph(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
    numeric_ids: bool = True,
    pre_deduped: bool = False,
    weighted: bool = False,
) -> PreparedGraph:
    """Build the static PageRank structures once (see
    :class:`PreparedGraph`). Identical semantics to the inline setup in
    :func:`pagerank` — in fact it IS that setup, factored out."""
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if weighted:
        dedup = edges.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
    else:
        dedup = edges.select("src", "dst")
        if not pre_deduped:
            dedup = dedup.distinct()
    vmap = None
    if numeric_ids:
        str_verts = vertices_from_edges(dedup)
        vmap = materialize(
            str_verts.select("id", F.xxhash64("id").alias("vid"))
            .repartition(n_part, "vid")
        )
        n_str = vmap.count()
        if vmap.select("vid").distinct().count() != n_str:
            # 64-bit collision (astronomically unlikely): string fallback
            vmap = None
        else:
            dedup = materialize(
                dedup.select(
                    F.xxhash64("src").alias("src"),
                    F.xxhash64("dst").alias("dst"),
                    *([F.col("w")] if weighted else []),
                )
            )
    if weighted:
        outdeg = dedup.groupBy("src").agg(
            F.count(F.lit(1)).alias("deg"), F.sum("w").alias("wsum")
        )
        share = F.col("w") / F.col("wsum")
    else:
        outdeg = dedup.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        share = F.lit(1.0) / F.col("deg")
    # persist (NOT localCheckpoint): keeps hashpartitioning(src) visible
    # to Catalyst, so the per-superstep scatter join never re-exchanges
    # this O(E) side — only the O(V) ranks side shuffles. The explicit
    # repartition is NOT redundant: if the outdeg join broadcasts, the
    # join output keeps the scan's (unknown) partitioning and the loop
    # would re-exchange the O(E) side EVERY superstep — measured as a
    # ~27% loop slowdown at 100M edges when this was dropped.
    links = (
        dedup.join(outdeg, "src")
        .select("src", "dst", share.alias("share"))
        .repartition(n_part, "src")
        .persist()
    )
    links.count()
    verts = vertices_from_edges(dedup)
    n = verts.count()
    return PreparedGraph(links, outdeg, verts, n, vmap, n_part, weighted)


def pagerank(
    spark: SparkSession,
    edges: DataFrame | None,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    checkpoint_interval: int = 10,
    resume: bool = False,
    use_salted: bool = False,
    lineage_cut_interval: int = 1,
    numeric_ids: bool = True,
    pre_deduped: bool = False,
    weighted: bool = False,
    sources: list[str] | None = None,
    partition_metrics: bool | None = None,
    initial_ranks: DataFrame | None = None,
    prepared: PreparedGraph | None = None,
) -> PregelResult:
    """Run PageRank to ``tol`` convergence (or exactly ``max_iter``
    supersteps when ``tol=0``). Returns ranks as (id, rank).

    ``numeric_ids``: run the loop on ``xxhash64(id)`` long keys instead
    of url strings — shuffle rows shrink from ~40 to 16 bytes and
    hash/compare costs drop, which is where a memory-bandwidth-bound
    superstep spends its time (PageRank semantics never order by id, so
    results are identical). A one-time collision check falls back to
    string keys if the 64-bit space ever collides (P ~ V^2 / 2^65).

    ``weighted``: rank flows proportionally to edge weight (the
    reference's integer edge values, ``pregel/loader.lua:105``):
    share(u->v) = w(u,v) / Σ_x w(u,x); parallel edges sum their
    weights. Default is the unweighted uniform split.

    ``sources``: personalized PageRank — the (1-d) restart mass and
    dangling mass both return to the given source vertices (uniformly
    over those present in the graph) instead of all vertices.

    ``initial_ranks``: warm start from a previous run's
    ``result.vertices`` (string-id ``(id, rank)``; mapped to numeric
    keys internally when ``numeric_ids``). The recurrence is a
    d-contraction in L1, so ANY start vector converges to the same
    unique fixpoint — warm starting changes only the superstep count,
    which is the production recrawl pattern: after mutating a small
    fraction of a web-scale edge table, restart from yesterday's ranks
    and converge in a few supersteps instead of dozens. Vertices new
    to the graph fall back to the cold value; vanished vertices are
    dropped (the vertex set always comes from the CURRENT graph). The
    start vector is renormalized to total mass 1.

    ``prepared``: a :class:`PreparedGraph` from :func:`prepare_graph` —
    skips the O(E) setup entirely (``edges`` may then be None) and
    leaves the caller the owner of the persisted link table. The
    multi-run pattern: ``spam_mass`` and warm-start sweeps build once,
    run many. ``numeric_ids``/``pre_deduped``/``weighted``/
    ``num_partitions`` are ignored in favor of the prepared values.
    """
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    run_id = run_id or uuid.uuid4().hex[:12]
    ckpt = CheckpointManager(checkpoint_dir, run_id) if checkpoint_dir else None
    if partition_metrics is None:
        # per-partition I5 stats ride the convergence action whenever the
        # run is durable (checkpointed) — that is where skew diagnosis
        # lives; bare benchmark loops keep the minimal flat aggregation
        # (the grouped variant costs ~0.2-0.4s/superstep at 32 cores)
        partition_metrics = ckpt is not None

    # static structures: out-degree-normalized link shares, dangling
    # flag — built by prepare_graph (multi-edge collapse, numeric-id
    # map + collision check, persisted hash-partitioned links). Callers
    # running SEVERAL PageRanks over one graph pass ``prepared=`` and
    # pay this once; they then own the link-table lifecycle.
    owns_links = prepared is None
    if prepared is None:
        prepared = prepare_graph(
            spark,
            edges,
            num_partitions=n_part,
            numeric_ids=numeric_ids,
            pre_deduped=pre_deduped,
            weighted=weighted,
        )
    links, outdeg, verts = prepared.links, prepared.outdeg, prepared.verts
    n, vmap, n_part = prepared.n, prepared.vmap, prepared.n_part
    if n == 0:
        if owns_links:
            links.unpersist()
        empty_ids = vmap if vmap is not None else verts
        return PregelResult(
            vertices=empty_ids.limit(0)
            .select(F.col("id"), F.lit(0.0).alias("rank")),
            supersteps=0,
            converged=True,
            metrics=[],
            run_id=run_id,
        )
    stepm = StepMaterializer(cut_interval=lineage_cut_interval)
    src_df = None
    if sources is not None:
        src_df = spark.createDataFrame([(s,) for s in sources], "id string")
        if vmap is not None:
            src_df = src_df.select(F.xxhash64("id").alias("id"))
        src_df = src_df.distinct().join(verts, "id", "left_semi")
        n_restart = src_df.count()
        if n_restart == 0:
            raise ValueError("no personalization source is present in the graph")
    else:
        n_restart = n
    warm = None
    if initial_ranks is not None:
        warm = initial_ranks.select("id", F.col("rank").alias("_warm"))
        if vmap is not None:
            warm = warm.select(F.xxhash64("id").alias("id"), "_warm")
        # a duplicate id in initial_ranks would fan out the vertex
        # table through the left join and silently inflate rank mass;
        # resolve deterministically (max) instead
        warm = warm.groupBy("id").agg(F.max("_warm").alias("_warm"))
    base = verts.join(outdeg.withColumnRenamed("src", "id"), "id", "left_outer")
    if src_df is not None:
        base = base.join(src_df.withColumn("_s", F.lit(True)), "id", "left_outer")
        cold = (
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_restart))
            .otherwise(F.lit(0.0))
        )
    else:
        cold = F.lit(1.0 / n)
    if warm is not None:
        base = base.join(warm, "id", "left_outer")
        init = F.coalesce(F.col("_warm"), cold)
    else:
        init = cold
    cols = [
        F.col("id"),
        init.alias("rank"),
        F.col("deg").isNull().alias("is_dangling"),
    ]
    if src_df is not None:
        cols.append(F.col("_s").isNotNull().alias("is_source"))
    ranks = base.select(*cols).repartition(n_part, "id").persist()
    if warm is not None:
        tot = ranks.agg(F.sum("rank").alias("t")).collect()[0]["t"] or 1.0
        # withColumn preserves the hash partitioning on id (narrow dep)
        normalized = ranks.withColumn(
            "rank", F.col("rank") / F.lit(float(tot))
        ).persist()
        normalized.count()
        ranks.unpersist()
        ranks = normalized
    row = ranks.agg(
        F.sum(F.when(F.col("is_dangling"), F.col("rank"))).alias("dm")
    ).collect()[0]
    dm = row["dm"] or 0.0
    stepm.advance(ranks, superstep=1, persisted=True)  # initial state is persisted

    start_step, metrics = 1, []
    part_metrics: list[dict] = []
    n_metrics_appended = 0
    n_pmetrics_appended = 0
    if resume and ckpt is not None:
        latest = ckpt.latest()
        if latest is not None:
            st, _, meta = ckpt.load(spark, latest)
            ranks = materialize(st.repartition(n_part, "id"))
            dm = meta["dm"]
            n = meta["n"]
            start_step = latest + 1

    shufd = ShuffleDelta(spark)
    with bsp_loop_confs(spark):
        converged = False
        superstep = start_step - 1
        for superstep in range(start_step, max_iter + 1):
            t0 = time.monotonic()
            contribs = links.join(ranks.withColumnRenamed("id", "src"), "src").select(
                "dst", (F.col("rank") * F.col("share")).alias("contrib")
            )
            if use_salted:
                sums = salted_sum(contribs, "dst", "contrib").withColumnRenamed(
                    "sum_contrib", "s"
                )
            else:
                sums = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
            if src_df is not None:
                restart = F.when(
                    F.col("is_source"),
                    F.lit((1.0 - d) / n_restart) + F.lit(d * dm / n_restart),
                ).otherwise(F.lit(0.0))
                new_rank = restart + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))
            else:
                new_rank = (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(dm / n))
                )
            nxt = stepm.step(
                ranks.join(sums.withColumnRenamed("dst", "id"), "id", "left_outer")
                .select(
                    "id",
                    new_rank.alias("new_rank"),
                    F.abs(new_rank - F.col("rank")).alias("delta"),
                    "is_dangling",
                    *(["is_source"] if src_df is not None else []),
                )
                .withColumnRenamed("new_rank", "rank"),
                superstep,
            )
            # ONE action serves convergence + dangling aggregator + (when
            # partition_metrics) the per-partition I5 stats: grouping the
            # same aggregation by spark_partition_id yields one tiny row
            # per physical state partition (the reference's per-worker
            # superstep stats, pregel/master.lua:60-63) and the driver
            # folds the global values from them. ``partition_metrics=
            # False`` keeps the flat two-stage agg for minimum fixed
            # per-superstep cost.
            if partition_metrics:
                prows = nxt.groupBy(F.spark_partition_id().alias("pid")).agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.max("delta").alias("max_delta"),
                    F.sum(F.when(F.col("is_dangling"), F.col("rank"))).alias("dm"),
                ).collect()
                max_delta = max(
                    (r["max_delta"] for r in prows if r["max_delta"] is not None),
                    default=0.0,
                )
                dm = sum(r["dm"] or 0.0 for r in prows)
                part_metrics.extend(
                    {
                        "run_id": run_id,
                        "superstep": superstep,
                        "partition_id": r["pid"],
                        "rows": r["rows"],
                    }
                    for r in prows
                )
            else:
                row = nxt.agg(
                    F.max("delta").alias("max_delta"),
                    F.sum(F.when(F.col("is_dangling"), F.col("rank"))).alias("dm"),
                ).collect()[0]
                max_delta = row["max_delta"] or 0.0
                dm = row["dm"] or 0.0
            stepm.advance(nxt, superstep)
            keep = ["id", "rank", "is_dangling"] + (
                ["is_source"] if src_df is not None else []
            )
            ranks = nxt.select(*keep)
            metrics.append(
                {
                    "run_id": run_id,
                    "superstep": superstep,
                    "wall_ms": (time.monotonic() - t0) * 1000,
                    "delta_max": max_delta,
                    **shufd.sample(),
                }
            )
            done = tol > 0 and max_delta < tol
            if ckpt is not None and (superstep % checkpoint_interval == 0 or done):
                ckpt.save(
                    superstep,
                    ranks,
                    meta={
                        "dm": dm,
                        "n": n,
                        "max_delta": max_delta,
                        "numeric_ids": vmap is not None,
                    },
                )
                ckpt.append_metrics(spark, metrics[n_metrics_appended:])
                n_metrics_appended = len(metrics)
                ckpt.append_partition_metrics(spark, part_metrics[n_pmetrics_appended:])
                n_pmetrics_appended = len(part_metrics)
            if done:
                converged = True
                break

    # final state is materialized (cached/checkpointed); the static link
    # table is no longer needed by THIS run — free executor storage
    # unless the caller shared it via ``prepared=`` (they release())
    ranks = materialize(ranks.select("id", "rank", "is_dangling"))
    if owns_links:
        links.unpersist()
    out = ranks.select("id", "rank")
    if vmap is not None:
        out = (
            out.withColumnRenamed("id", "vid")
            .join(vmap, "vid")
            .select("id", "rank")
        )
    return PregelResult(
        vertices=out,
        supersteps=superstep,
        converged=converged,
        metrics=metrics,
        run_id=run_id,
        partition_metrics=part_metrics,
    )


def spam_mass(
    spark: SparkSession,
    edges: DataFrame,
    trusted: list[str],
    max_iter: int = 4,
    d: float = 0.85,
    pre_deduped: bool = False,
    **kwargs,
) -> DataFrame:
    """TrustRank spam-mass estimation (Gyongyi et al. 2004/2005): run
    uniform PageRank ``p`` and trust-seeded personalized PageRank
    ``t`` (restart + dangling mass return to ``trusted``) over the
    SAME graph, and report the relative spam mass
    ``(p - t) / p`` per page — the fraction of a page's rank that
    does NOT flow from the trusted seed set. Near 1 for link-spam
    targets, near/below 0 for pages well-connected to the seeds. The
    classic web-spam demotion signal, and the canonical consumer of
    the engine's ``sources=`` PPR mode.

    Returns (id, pr, tr, spam_mass), all unrounded doubles; contract
    queries round at the boundary. ``p > 0`` always (the (1-d)/n
    uniform floor), so the division is total.

    Scale: exactly two PageRank runs (each the audited per-superstep
    plan) + one final hash join on id — and the runs share ONE
    :class:`PreparedGraph`, so the O(E) dedup, numeric-id map, and
    persisted link-share build happen once, not twice. At sf0.1 the
    saving is modest (~1-2s — local-mode per-job overhead dominates
    the tiny setup scans); the point is the 100 TB shape, where the
    setup is two full O(E) edge-table passes plus an O(E) persist and
    repeating it doubles the fixed cost of the pair. Parallel arcs
    collapse once here (standard
    link-graph semantics, same as ``pagerank``'s default; pass
    ``pre_deduped=True`` to skip that one-time O(E) shuffle).
    ``**kwargs`` forwards the remaining knobs (checkpointing, numeric
    ids, partitions) to the shared build and BOTH runs; ``sources`` is
    owned by the trust run and may not be overridden.
    """
    for k in ("sources", "pre_deduped"):
        if k in kwargs:
            raise ValueError(f"spam_mass owns the '{k}' knob; see docstring")
    # both runs share ONE PreparedGraph: the O(E) dedup + numeric-id
    # map + persisted link-share table are built once, not per run —
    # at web scale that halves the fixed cost of the pair
    prep = prepare_graph(
        spark,
        edges,
        num_partitions=kwargs.get("num_partitions"),
        numeric_ids=kwargs.pop("numeric_ids", True),
        pre_deduped=pre_deduped,
        weighted=kwargs.pop("weighted", False),
    )
    try:
        p = pagerank(
            spark, None, d=d, tol=0.0, max_iter=max_iter, prepared=prep, **kwargs
        ).vertices.select("id", F.col("rank").alias("pr"))
        t = pagerank(
            spark, None, d=d, tol=0.0, max_iter=max_iter, prepared=prep,
            sources=trusted, **kwargs
        ).vertices.select("id", F.col("rank").alias("tr"))
        out = p.join(t, "id").select(
            "id", "pr", "tr",
            ((F.col("pr") - F.col("tr")) / F.col("pr")).alias("spam_mass"),
        )
        # both runs' vertices are materialized; the shared links can go
        return materialize(out)
    finally:
        prep.release()
