"""Single-source shortest paths: frontier Bellman-Ford as a BSP loop.

SSSP is the worked example of the original Pregel paper (Malewicz et
al., SIGMOD 2010 §2) — the reference engine's vertex API
(``pregel/vertex.lua``: ``send_message`` / ``vote_halt``) exists to
express exactly this kernel; we provide it natively. Spark-first
mapping of the textbook algorithm:

- static weighted link table persisted hash-partitioned on ``src``
  (the same load-bearing repartition as pagerank.py — the O(E) side
  never re-exchanges inside the loop);
- the frontier IS the reference's active-vertex set (F2/F7): only
  vertices whose distance improved last superstep scatter
  ``dist + w`` messages, so per-superstep shuffle volume tracks the
  wave of relaxations instead of staying O(E) — message volume is
  O(edges out of the frontier), the textbook Pregel win;
- the min-combiner (A1) is a ``groupBy(id).min`` with map-side partial
  aggregation, so hub fan-in collapses before the shuffle — FUSED with
  the state merge (see ``_relax``): raw relaxations and carried state
  rows share one union + aggregation, one exchange, no sorts;
- the loop-carried state is the VISITED set only — O(reached), not
  O(V). The first 100M-edge protocol run carried a full O(V) dist
  table and spent 17-25s per superstep materializing ~94M mostly-NULL
  rows while the measured shuffle volume was near zero
  (BENCH_SCALING_sssp.json); unreached vertices are implicit until
  one final ``verts LEFT JOIN dist`` projection. At 10^12 documents a
  BFS wave touches a tiny fraction of the graph for many supersteps —
  per-superstep cost must track the wave, in state size as well as in
  message volume. The state grows through the fused merge aggregation
  — newly reached vertices are the rows whose carried ``_old`` is
  NULL;
- termination = empty frontier (the reference's ``__messages == 0``
  rule, ``pregel/master.lua``): Bellman-Ford relaxation is monotone,
  so extra supersteps after quiescence are no-ops — which is what
  makes the fixed-k unrolled DuckDB oracle (``sssp_k8``) exact.

Unreached vertices keep ``dist = NULL`` (infinity). Parallel edges
need no pre-dedup: the min-combiner absorbs them.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..tableio import CheckpointManager
from .build import order_preserving_id_map, vertices_from_edges
from .engine import (
    PregelResult,
    ShuffleDelta,
    StepMaterializer,
    bsp_loop_confs,
    materialize,
)

# Cache-batch pruning of the persisted link table (see shortest_paths):
# bucket count for the src-hash clustering column, and the frontier
# size above which pruning is skipped (large waves touch most buckets
# and the tiny bucket-listing job would be pure overhead).
_PRUNE_B = 256
_PRUNE_FRONTIER_CAP = 100_000


def _as_source_df(spark: SparkSession, sources: list | DataFrame) -> DataFrame:
    if isinstance(sources, DataFrame):
        return sources.select("id").distinct()
    return spark.createDataFrame([(s,) for s in sources], "id string").distinct()


def _symmetrize(e: DataFrame, directed: bool) -> DataFrame:
    if directed:
        return e
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def _frontier(state: DataFrame) -> DataFrame:
    return state.filter("changed").select(F.col("id").alias("src"), "dist")


def _relax(
    state: DataFrame,
    frontier: DataFrame,
    links_t: DataFrame,
    stepm: StepMaterializer,
    superstep: int,
    obs: Observation | None = None,
) -> DataFrame:
    """ONE Bellman-Ford superstep, shared by the in-memory and the
    bucket-indexed loops (their results are asserted identical by the
    sssp_k8 / sssp_k8_indexed contract rows — one body, no drift):
    scatter ``dist + w`` out of the frontier, then min-combine AND
    merge into the visited set in ONE union + ``groupBy(id)`` — raw
    relaxations and carried state rows share the same map-side partial
    min and the same hash exchange. O(visited + msgs), never O(V).

    Round-4 shape change: the former ``groupBy(dst).min`` ⋈ FULL OUTER
    merge planned as a SortMergeJoin whose output partitioning is
    UNKNOWN, so every superstep re-exchanged and re-sorted the visited
    set on top of the message exchange (the temporal loop measured
    0.65 scaling at 2→8 on that shape vs a 0.94 PageRank control).
    Union-then-aggregate has one exchange, no sorts, and its
    ``hashpartitioning(id, n)`` output survives the checkpoint, so the
    loop stays exchange-shaped like pagerank.py's. When ``obs`` is
    given, the new-frontier count (the reference's ``__messages``
    termination counter) rides the SAME eager-checkpoint action — no
    separate per-superstep count job."""
    raw = links_t.join(frontier, "src").select(
        F.col("dst").alias("id"),
        F.lit(None).cast("double").alias("_old"),
        (F.col("dist") + F.col("weight")).alias("_md"),
    )
    merged = (
        state.select(
            "id",
            F.col("dist").alias("_old"),
            F.lit(None).cast("double").alias("_md"),
        )
        .unionByName(raw)
        .groupBy("id")
        .agg(F.min("_old").alias("_old"), F.min("_md").alias("_md"))
    )
    improved = F.col("_md").isNotNull() & (
        F.col("_old").isNull() | (F.col("_md") < F.col("_old"))
    )
    plan = merged.select(
        "id",
        F.when(improved, F.col("_md")).otherwise(F.col("_old")).alias("dist"),
        improved.alias("changed"),
    )
    if obs is not None:
        plan = plan.observe(obs, F.sum(F.col("changed").cast("long")).alias("nf"))
    return stepm.step(plan, superstep)


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    sources: list | DataFrame,
    max_iter: int = 100,
    num_partitions: int | None = None,
    directed: bool = True,
    run_id: str | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 10,
    resume: bool = False,
    partition_metrics: bool | None = None,
    numeric_ids: bool = True,
) -> PregelResult:
    """Weighted shortest distances from a source set. Returns
    (id, dist) over ALL vertices; ``dist`` is NULL where unreachable.

    ``sources``: vertex ids (list, or a DataFrame with an ``id``
    column); distance 0 at every source. ``directed=False``
    symmetrizes the edge list first (each edge relaxes both ways).
    Negative weights are rejected — with a frontier stop rule they
    would require the full |V|-1 Bellman-Ford rounds to be sound.

    ``numeric_ids`` (connected_components' scheme): map string ids to
    dense longs once and run the loop on 8-byte keys. The per-superstep
    floor is the probe of the cached O(E) link table against the
    frontier hash map, and a long-key probe (LongHashedRelation)
    measured ~9x cheaper than string keys at equal row count — string
    hashing + equality dominate an otherwise-tiny superstep. Distances
    are id-representation-independent, so results are byte-identical.
    """
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    run_id = run_id or uuid.uuid4().hex[:12]
    ckpt = CheckpointManager(checkpoint_dir, run_id) if checkpoint_dir else None
    if partition_metrics is None:
        partition_metrics = ckpt is not None  # see pagerank.py rationale

    e = _symmetrize(
        edges.select("src", "dst", F.col("weight").cast("double").alias("weight")),
        directed,
    )
    src_df = _as_source_df(spark, sources)
    vmap = None
    if numeric_ids:
        verts_all = (
            vertices_from_edges(e).unionByName(src_df).distinct()
        )
        vmap = materialize(
            order_preserving_id_map(verts_all, n_part).repartition(n_part, "vid")
        )
        e = (
            e.join(vmap.withColumnRenamed("id", "src"), "src")
            .select(F.col("vid").alias("src"), "dst", "weight")
            .join(vmap.withColumnRenamed("id", "dst"), "dst")
            .select("src", F.col("vid").alias("dst"), "weight")
        )
        src_df = src_df.join(vmap, "id").select(F.col("vid").alias("id"))
    # `_b` + sortWithinPartitions: cluster the cached link table by a
    # src-hash bucket so the in-memory columnar scan's per-batch
    # min/max stats can SKIP batches under a `_b IN (...)` filter —
    # the cache-resident twin of write_edge_buckets' directory pruning.
    # Motivation (BENCH_SCALING_sssp.json, round 4): a BFS wave's
    # near-empty early supersteps still paid a FULL O(E) cache scan to
    # join a handful of frontier rows — 40-75 s/step at 2 cores on
    # 100M edges with <2 MB of real work, and that fixed floor is what
    # dragged 2→8 scaling to 0.77. sortWithinPartitions preserves the
    # hash(src) layout, so loop joins stay exchange-free.
    links = (
        e.withColumn(
            "_b", F.pmod(F.xxhash64("src"), F.lit(_PRUNE_B)).cast("int")
        )
        .repartition(n_part, "src")
        .sortWithinPartitions("_b")
        .persist()
    )
    links.count()
    # validated on the persisted table — no second upstream scan
    if links.filter(F.col("weight") < 0).limit(1).count() > 0:
        links.unpersist()
        raise ValueError("shortest_paths requires non-negative edge weights")

    # visited-only state: just the sources at superstep 0
    state = materialize(
        src_df.select(
            "id", F.lit(0.0).alias("dist"), F.lit(True).alias("changed")
        ).repartition(n_part, "id")
    )
    stepm = StepMaterializer()
    stepm.advance(state, superstep=1, persisted=False)
    n_frontier = state.count()

    start_step, metrics = 1, []
    part_metrics: list[dict] = []
    n_metrics_appended = 0
    n_pmetrics_appended = 0
    if resume and ckpt is not None:
        latest = ckpt.latest()
        if latest is not None:
            st, _, meta = ckpt.load(spark, latest)
            state = materialize(st.repartition(n_part, "id"))
            stepm.advance(state, superstep=latest, persisted=False)
            n_frontier = meta["frontier"]
            start_step = latest + 1

    converged = n_frontier == 0
    superstep = start_step - 1
    shufd = ShuffleDelta(spark)
    with bsp_loop_confs(spark):
        for superstep in range(start_step, max_iter + 1):
            if converged:
                superstep -= 1
                break
            t0 = time.monotonic()
            frontier = _frontier(state)
            # cache-batch pruning (see the links build note): when the
            # frontier is small, one tiny driver job lists its hash
            # buckets and the scatter scans only the matching cached
            # batches instead of all of E. Gated on the known frontier
            # count so large waves skip both the extra job and a
            # useless IN filter.
            links_t, b_scanned = links, None
            if 0 < n_frontier <= _PRUNE_FRONTIER_CAP:
                blist = [
                    r["b"]
                    for r in frontier.select(
                        F.pmod(F.xxhash64("src"), F.lit(_PRUNE_B))
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                ]
                if len(blist) <= _PRUNE_B // 2:
                    links_t = links.filter(F.col("_b").isin(blist))
                    b_scanned = len(blist)
            # the new-frontier count rides the checkpoint action via
            # observe() unless per-partition I5 stats are on (those
            # need one grouped pass over the cached state)
            obs = (
                None
                if partition_metrics
                else Observation(f"nf_{run_id}_{superstep}")
            )
            nxt = _relax(state, frontier, links_t, stepm, superstep, obs=obs)
            if partition_metrics:
                prows = nxt.groupBy(F.spark_partition_id().alias("pid")).agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(F.col("changed").cast("long")).alias("nf"),
                ).collect()
                n_frontier = sum(r["nf"] or 0 for r in prows)
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
                n_frontier = int(obs.get["nf"] or 0)
            stepm.advance(nxt, superstep)
            state = nxt
            m = {
                "run_id": run_id,
                "superstep": superstep,
                "wall_ms": (time.monotonic() - t0) * 1000,
                "frontier": n_frontier,
                **shufd.sample(),
            }
            if b_scanned is not None:
                m["buckets_scanned"] = b_scanned
            metrics.append(m)
            if ckpt is not None and (
                superstep % checkpoint_interval == 0 or n_frontier == 0
            ):
                ckpt.save(superstep, state, meta={"frontier": n_frontier})
                ckpt.append_metrics(spark, metrics[n_metrics_appended:])
                n_metrics_appended = len(metrics)
                ckpt.append_partition_metrics(spark, part_metrics[n_pmetrics_appended:])
                n_pmetrics_appended = len(part_metrics)
            if n_frontier == 0:
                converged = True
                break

    # one final O(V) projection: every vertex (plus foreign sources),
    # NULL dist where the wave never arrived; numeric mode maps the
    # dense vids back to the original string ids
    verts = vertices_from_edges(links).unionByName(src_df).distinct()
    out = verts.join(state.select("id", "dist"), "id", "left_outer").select(
        "id", "dist"
    )
    if vmap is not None:
        out = (
            out.withColumnRenamed("id", "_v")
            .join(vmap.withColumnRenamed("vid", "_v"), "_v")
            .select("id", "dist")
        )
    out = materialize(out)
    links.unpersist()
    return PregelResult(
        vertices=out,
        supersteps=superstep,
        converged=converged,
        metrics=metrics,
        run_id=run_id,
        partition_metrics=part_metrics,
    )


def write_edge_buckets(
    edges: DataFrame,
    path: str,
    buckets: int = 256,
    directed: bool = True,
) -> None:
    """The SSSP 100 TB path, step 1 (same shape as the IVF index,
    ``pipeline/simsearch.write_ivf_index``): symmetrize/cast ONCE and
    write the edge table parquet-partitioned by
    ``bucket = pmod(xxhash64(src), buckets)`` plus a meta sidecar.

    Why: at 10^12 documents the edge table does not fit in executor
    memory, so every superstep of a plain BSP loop re-scans the full
    table from storage even when the frontier is a handful of vertices
    (measured on the 100M-edge protocol: ~20s/superstep of pure O(E)
    scan while the frontier shuffle was ~0 MB). A frontier that
    touches f of the B buckets prunes the scan to f/B of the bytes —
    the inverted-list trick, expressed as parquet partition pruning.
    """
    e = _symmetrize(
        edges.select("src", "dst", F.col("weight").cast("double").alias("weight")),
        directed,
    )
    e.withColumn("bucket", F.pmod(F.xxhash64("src"), F.lit(buckets))).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(f"{path}/edges")
    spark = edges.sparkSession
    # validate on the WRITTEN data (one cheap min over parquet stats)
    # so shortest_paths_indexed can rely on non-negative weights
    wmin = (
        spark.read.parquet(f"{path}/edges")
        .agg(F.min("weight").alias("m"))
        .collect()[0]["m"]
    )
    if wmin is not None and wmin < 0:
        raise ValueError("write_edge_buckets requires non-negative edge weights")
    spark.createDataFrame(
        [(buckets,)], "buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def shortest_paths_indexed(
    spark: SparkSession,
    path: str,
    sources: list | DataFrame,
    max_iter: int = 100,
    num_partitions: int | None = None,
    run_id: str | None = None,
) -> PregelResult:
    """The SSSP 100 TB path, step 2: run the same frontier Bellman-Ford
    over a :func:`write_edge_buckets` layout, scanning ONLY the bucket
    directories the current frontier's vertices hash into (static
    ``bucket IN (...)`` partition filter — verified by an
    ``inputFiles()`` test). Results are identical to
    :func:`shortest_paths` on the same (pre-symmetrized) edges;
    weights were validated non-negative at write time by the caller.

    Trade vs the in-memory loop: each superstep pays a pruned DISK
    scan instead of a full CACHE scan — strictly better once the edge
    table exceeds memory or the frontier touches few buckets, which is
    the regime this entry point exists for."""
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    run_id = run_id or uuid.uuid4().hex[:12]
    buckets = spark.read.parquet(f"{path}/meta").collect()[0]["buckets"]
    edges_path = f"{path}/edges"

    src_df = _as_source_df(spark, sources)

    state = materialize(
        src_df.select(
            "id", F.lit(0.0).alias("dist"), F.lit(True).alias("changed")
        ).repartition(n_part, "id")
    )
    stepm = StepMaterializer()
    stepm.advance(state, superstep=1, persisted=False)
    n_frontier = state.count()

    metrics: list[dict] = []
    converged = n_frontier == 0
    superstep = 0
    shufd = ShuffleDelta(spark)
    with bsp_loop_confs(spark):
        for superstep in range(1, max_iter + 1):
            if converged:
                superstep -= 1
                break
            t0 = time.monotonic()
            frontier = _frontier(state)
            # the frontier's bucket set: one tiny driver action over the
            # cached O(frontier) state; the IN-list is a STATIC filter,
            # so Spark prunes bucket directories at scan planning time
            blist = [
                r["b"]
                for r in frontier.select(
                    F.pmod(F.xxhash64("src"), F.lit(buckets)).alias("b")
                )
                .distinct()
                .collect()
            ]
            links_t = spark.read.parquet(edges_path).filter(
                F.col("bucket").isin(blist)
            )
            obs = Observation(f"nf_{run_id}_{superstep}")
            nxt = _relax(state, frontier, links_t, stepm, superstep, obs=obs)
            n_frontier = int(obs.get["nf"] or 0)
            stepm.advance(nxt, superstep)
            state = nxt
            metrics.append(
                {
                    "run_id": run_id,
                    "superstep": superstep,
                    "wall_ms": (time.monotonic() - t0) * 1000,
                    "frontier": n_frontier,
                    "buckets_scanned": len(blist),
                    **shufd.sample(),
                }
            )
            if n_frontier == 0:
                converged = True
                break

    verts = vertices_from_edges(
        spark.read.parquet(edges_path).select("src", "dst")
    ).unionByName(src_df).distinct()
    out = materialize(
        verts.join(state.select("id", "dist"), "id", "left_outer").select(
            "id", "dist"
        )
    )
    return PregelResult(
        vertices=out,
        supersteps=superstep,
        converged=converged,
        metrics=metrics,
        run_id=run_id,
    )


def pseudo_diameter(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 32,
    num_partitions: int | None = None,
) -> DataFrame:
    """Double-sweep BFS diameter lower bound of the undirected simple
    graph (Magnien, Latapy & Habib 2009 — the standard web-graph
    diameter estimator): BFS from a deterministic start (the minimum
    vertex id), hop to the farthest reached vertex (ties broken by
    minimum id), BFS again from there; ``diameter_lb = max`` of the
    two eccentricities. Exact on trees; a tight lower bound in
    practice on web graphs. Returns ONE row
    (start_id, start_ecc, far_id, far_ecc, diameter_lb) — integer hop
    counts, eccentricities WITHIN the start's component (unreachable
    vertices are excluded, per :func:`shortest_paths` NULL semantics).

    Plan: two frontier Bellman-Ford waves (unit weights == BFS) over
    the same statically partitioned edge cache, plus three
    driver-scalar round-trips (min-id source, argmax hop, final max)
    — the same documented scalar-pick idiom as the SSSP bench source.
    ``max_iter`` caps each wave; callers must size it >= the true
    eccentricity (the waves stop early at frontier exhaustion, so the
    cap only bites on pathological chains; contract fixtures pin it).
    """
    e = edges.select("src", "dst").withColumn("weight", F.lit(1.0))
    src1 = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .agg(F.min("id").alias("m"))
        .collect()[0]["m"]
    )
    r1 = shortest_paths(
        spark, e, [src1], max_iter=max_iter, directed=False,
        num_partitions=num_partitions,
    )
    far = (
        r1.vertices.filter(F.col("dist").isNotNull())
        .orderBy(F.col("dist").desc(), F.col("id").asc())
        .limit(1)
        .collect()[0]
    )
    r2 = shortest_paths(
        spark, e, [far["id"]], max_iter=max_iter, directed=False,
        num_partitions=num_partitions,
    )
    ecc2 = (
        r2.vertices.agg(F.max("dist").alias("m")).collect()[0]["m"] or 0.0
    )
    ecc1, ecc2 = int(far["dist"]), int(ecc2)
    return spark.createDataFrame(
        [(src1, ecc1, far["id"], ecc2, max(ecc1, ecc2))],
        "start_id string, start_ecc int, far_id string, far_ecc int,"
        " diameter_lb int",
    )
