"""Multi-level Louvain community detection, integer-exact.

Composes the repo's two existing community primitives — the
synchronized local-move round (``structure.refine_modularity``) and
graph coarsening (``build.contract_graph``) — into the full
Blondel et al. 2008 pipeline: start every vertex in its own community,
local-move for a few synchronized rounds, CONTRACT communities to
supervertices (intra-community weight folds into supervertex
self-weight), and repeat on the coarsened graph. No reference
counterpart (§2.9 analytics extras) — the standard web-graph community
detector next to LPA.

Exactness: the whole pipeline is INTEGER arithmetic end to end.
Weights are cast to long (the contracted levels' weights are edge
multiplicities, integers by construction); the local-move argmax
compares the integer score ``s = 2m·k_vB − deg_v·Σ'_B`` (equal to
``gain · 2m²``), with ties broken stay-first then smallest label — so
every round, every level, and the final vertex→community map are
bit-reproducible in any SQL engine (the ``louvain_l2`` contract row
unrolls two levels in DuckDB). Synchronized rounds are NOT
monotone in Q (the price every distributed Louvain pays — see
``refine_modularity``'s docstring); the fixed round/level schedule
keeps the operator deterministic, and callers can score levels with
:func:`modularity_weighted`.

Self-weights: a supervertex's internal (contracted) weight ``c_v``
contributes ``2·c_v`` to its weighted degree and ``c_v`` to the graph
total ``m`` — the standard convention — carried as a separate
``(id, c)`` table so the pairwise edge table stays loop-free.

Scale shape per round: one weighted-degree partial agg, one community
partial agg, one scatter join + (id, community) partial agg for the
``k`` census, one broadcast of the 1-row ``m`` — the LPA superstep
shape, nothing quadratic. Contraction is two hash joins + one partial
agg (``build.contract_graph``'s mapping form). Levels shrink the
graph geometrically on community-structured inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import materialize


def _weighted_simple(
    edges: DataFrame, weight_col: str | None
) -> tuple[DataFrame, DataFrame]:
    """Input arcs -> (sym, loops): ``sym`` the symmetrized loop-free
    weighted simple graph (src, dst, w) with BOTH directions carrying
    the full undirected weight ``W_uv = Σ arcs u→v plus v→u``; ``loops``
    the per-vertex self-arc weight (id, c). ``weight_col=None`` counts
    each DISTINCT arc once (simple-graph semantics, matching
    ``refine_modularity``); a weight column sums multiplicities."""
    if weight_col is None:
        e = edges.select("src", "dst").distinct().withColumn("w", F.lit(1).cast("long"))
    else:
        e = edges.select(
            "src", "dst", F.col(weight_col).cast("long").alias("w")
        )
    loops = (
        e.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("c"))
    )
    pairs = (
        e.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"), "w")
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    sym = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w").unionByName(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    return sym, loops


def _wdeg(sym: DataFrame, loops: DataFrame) -> DataFrame:
    """Weighted degree (id, deg): Σ incident W + 2·c."""
    d = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("deg"))
    return (
        d.join(loops, "id", "full_outer")
        .select(
            "id",
            (F.coalesce("deg", F.lit(0)) + 2 * F.coalesce("c", F.lit(0))).alias("deg"),
        )
    )


def local_move_round(
    sym: DataFrame,
    loops: DataFrame,
    labels: DataFrame,
    parity: int | None = None,
) -> DataFrame:
    """One synchronized weighted local-move round (the
    ``refine_modularity`` argmax generalized to integer weights and
    self-weights). ``labels``: (id, label) covering every vertex.
    Returns the new (id, label).

    ``parity``: when set (0 or 1), only vertices whose portable
    ``hash60(id) % 2`` equals it may move this round — the standard
    distributed-Louvain symmetry breaker. Fully synchronized rounds
    oscillate on symmetric structures (two tightly-linked vertices
    each adopt the OTHER's community and swap back next round — the
    classic two-coloring flip-flop); alternating halves makes each
    move see a half-frozen neighborhood, so pairwise merges stick.
    The parity class is a pure function of the id under the md5-based
    engine-portable hash family (``pipeline/hashing.py``), so
    external oracles replicate the schedule exactly."""
    lab = labels.select("id", F.col("label").alias("_lbl"))
    deg = _wdeg(sym, loops)
    m_df = sym.agg(
        # integer DIV, not float '/': '/' goes through a double, which
        # loses exactness once total edge weight exceeds 2^53 — the
        # same hazard four_cliques fixed with DIV. sum(w) is even by
        # symmetry, so DIV 2 is exact at any scale.
        F.expr("coalesce(sum(w), 0L) div 2").alias("_me")
    ).crossJoin(
        loops.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_mc"))
    ).select((F.col("_me") + F.col("_mc")).alias("_m"))
    sig = (
        lab.join(deg, "id", "left_outer")
        .groupBy("_lbl")
        .agg(F.sum(F.coalesce("deg", F.lit(0))).alias("_sig"))
    )
    k = (
        sym.join(lab.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"), F.col("_lbl").alias("_cand"))
        .agg(F.sum("w").alias("_k"))
    )
    own = lab.select("id", F.col("_lbl").alias("_cand"))
    cands = (
        k.unionByName(own.withColumn("_k", F.lit(0).cast("long")))
        .groupBy("id", "_cand")
        .agg(F.max("_k").alias("_k"))
    )
    scored = (
        cands.join(lab, "id")
        .join(deg.withColumnRenamed("deg", "_d"), "id", "left_outer")
        .withColumn("_d", F.coalesce("_d", F.lit(0)))
        .join(sig.withColumnRenamed("_lbl", "_cand"), "_cand")
        .withColumn(
            "_sigx",
            F.col("_sig")
            - F.when(F.col("_cand") == F.col("_lbl"), F.col("_d")).otherwise(0),
        )
        .crossJoin(F.broadcast(m_df))
        .withColumn(
            "_s", 2 * F.col("_m") * F.col("_k") - F.col("_d") * F.col("_sigx")
        )
    )
    pick = scored.groupBy("id").agg(
        F.min(
            F.struct(
                (-F.col("_s")).alias("neg"),
                F.when(F.col("_cand") == F.col("_lbl"), F.lit(0))
                .otherwise(1)
                .alias("stay"),
                F.col("_cand").alias("cand"),
            )
        ).alias("best")
    )
    moved = pick.select("id", F.col("best.cand").alias("label"))
    if parity is None:
        return moved
    from ..pipeline.hashing import hash60

    active = hash60(F.col("id")) % 2 == parity
    return moved.join(labels.select("id", F.col("label").alias("_old")), "id").select(
        "id",
        F.when(active, F.col("label")).otherwise(F.col("_old")).alias("label"),
    )


def modularity_weighted(
    sym: DataFrame, loops: DataFrame, labels: DataFrame
) -> DataFrame:
    """Weighted Newman Q per community over a (sym, loops) pair:
    (label, w_in, deg_sum, contrib) with
    ``contrib = w_in/m − (deg_sum/(2m))²``; ``w_in`` counts each
    intra-community pair once plus the members' self-weights."""
    lab = labels.select("id", F.col("label").alias("_lbl"))
    deg = _wdeg(sym, loops)
    up = sym.filter(F.col("src") < F.col("dst"))
    m_df = up.agg(F.coalesce(F.sum("w"), F.lit(0)).alias("_me")).crossJoin(
        loops.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_mc"))
    ).select((F.col("_me") + F.col("_mc")).cast("double").alias("_m"))
    intra = (
        up.join(lab.withColumnRenamed("id", "src").withColumnRenamed("_lbl", "_la"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("_lbl", "_lb"), "dst")
        .filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("_lbl"))
        .agg(F.sum("w").alias("_win"))
    )
    selfw = lab.join(loops, "id", "left_outer").groupBy("_lbl").agg(
        F.sum(F.coalesce("c", F.lit(0))).alias("_wc")
    )
    degsum = lab.join(deg, "id", "left_outer").groupBy("_lbl").agg(
        F.sum(F.coalesce("deg", F.lit(0))).alias("deg_sum")
    )
    return (
        degsum.join(intra, "_lbl", "left_outer")
        .join(selfw, "_lbl", "left_outer")
        .crossJoin(F.broadcast(m_df))
        .select(
            F.col("_lbl").alias("label"),
            (F.coalesce("_win", F.lit(0)) + F.coalesce("_wc", F.lit(0))).alias("w_in"),
            "deg_sum",
            (
                (F.coalesce("_win", F.lit(0)) + F.coalesce("_wc", F.lit(0))) / F.col("_m")
                - (F.col("deg_sum") / (2.0 * F.col("_m")))
                * (F.col("deg_sum") / (2.0 * F.col("_m")))
            ).alias("contrib"),
        )
    )


def louvain(
    spark: SparkSession,
    edges: DataFrame,
    levels: int = 2,
    rounds: int = 2,
    weight_col: str | None = None,
) -> DataFrame:
    """Multi-level Louvain: returns the VERTEX-level (id, label) after
    ``levels`` coarsening levels of ``rounds`` synchronized local-move
    rounds each. Labels are vertex ids (each level's community label
    is one of its member supervertices' labels), so the output is
    engine-portable without renumbering.

    Fixed deterministic schedule — every round runs even if converged
    (idempotent on a local optimum: strict improvement + stay bias),
    which is what makes the 2-level unrolled ``louvain_l2`` contract
    oracle exact. Stops coarsening early only when a level leaves
    every supervertex in its own singleton community (contraction
    would be the identity).
    """
    sym, loops = _weighted_simple(edges, weight_col)
    sym = materialize(sym)
    loops = materialize(loops)
    verts = sym.select(F.col("src").alias("id")).unionByName(
        loops.select("id")
    ).distinct()
    # vertex -> current supervertex (level-0: itself)
    assign = materialize(verts.select("id", F.col("id").alias("label")))

    for _level in range(levels):
        # level starts from singletons over the CURRENT supervertices
        sverts = sym.select(F.col("src").alias("id")).unionByName(
            loops.select("id")
        ).distinct()
        lab = materialize(sverts.select("id", F.col("id").alias("label")))
        for _r in range(rounds):
            lab = materialize(local_move_round(sym, loops, lab, parity=_r % 2))
        # identity level? (every supervertex stayed singleton)
        n_moved = lab.filter(F.col("id") != F.col("label")).limit(1).count()
        # fold this level into the vertex-level assignment
        assign = materialize(
            assign.join(
                lab.select(F.col("id").alias("label"), F.col("label").alias("_nl")),
                "label",
            ).select("id", F.col("_nl").alias("label"))
        )
        if n_moved == 0 or _level == levels - 1:
            break
        # contract: supervertex pairs -> community pairs; intra weight
        # and member self-weights fold into the new self-weight
        lb = lab.withColumnRenamed("id", "_v").withColumnRenamed("label", "_g")
        up = sym.filter(F.col("src") < F.col("dst"))
        mapped = (
            up.join(lb.withColumnRenamed("_v", "src").withColumnRenamed("_g", "_ga"), "src")
            .join(lb.withColumnRenamed("_v", "dst").withColumnRenamed("_g", "_gb"), "dst")
        )
        inter = (
            mapped.filter(F.col("_ga") != F.col("_gb"))
            .select(
                F.least("_ga", "_gb").alias("u"),
                F.greatest("_ga", "_gb").alias("v"),
                "w",
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
        )
        intra = (
            mapped.filter(F.col("_ga") == F.col("_gb"))
            .groupBy(F.col("_ga").alias("id"))
            .agg(F.sum("w").alias("c"))
        )
        carried = (
            loops.join(lb.withColumnRenamed("_v", "id"), "id")
            .groupBy(F.col("_g").alias("id"))
            .agg(F.sum("c").alias("c"))
        )
        sym = materialize(
            inter.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w").unionByName(
                inter.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
            )
        )
        loops = materialize(
            intra.unionByName(carried)
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
    return assign
