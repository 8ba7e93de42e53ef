"""Approximate neighborhood function (ANF / HyperBall-style):
per-round reach estimation with Flajolet-Martin bitmask sketches.

``N(t) = Σ_v |{w : dist(v→w) ≤ t}|`` — the neighborhood function — is
THE web-graph global-structure tool (effective diameter, connectivity
mass, bowtie sizing; Palmer et al. KDD'02 ANF, Boldi-Vigna HyperBall).
Exact N(t) needs all-pairs reachability (hopeless at 10^11 vertices);
the classic trick keeps ``k`` Flajolet-Martin sketches per vertex —
a 64-bit mask whose bit ``ρ(h(v))`` (= trailing zeros of a vertex
hash) is set — and each round ORs every vertex's sketch with its
out-neighbors' sketches:

    s_t(v) = s_{t-1}(v) | OR_{(v,w)∈E} s_{t-1}(w)

so after t rounds ``s_t(v)`` is exactly the FM sketch of v's radius-t
out-ball, and the lowest ZERO bit ``b`` estimates its size as
``2^b / 0.77351`` (FM's bias constant), averaged over the k
independent sketches.

The reference's BSP message loop (``pregel/vertex.lua``) would ship
per-neighbor sketch messages; here each round is ONE native
aggregation — join sketches onto edge destinations, ``bit_or``
group-by source — with map-side partial OR combine (bit_or is
associative/commutative, so the shuffle carries at most
``partitions × vertices`` 8-byte partials, same profile as the
PageRank sum). k sketches ride as k long columns of one row — no
row-count blowup in k.

Engine portability is by construction, like ``katz.py``: the hash is
the portable md5-backed ``hash60`` family, ρ and the lowest-zero-bit
are pure integer ops (``bit_count((h & -h) - 1)`` — both Spark and
DuckDB have two's-complement ``&``/``~`` and ``bit_count``), the
sketch recurrence is an integer ``bit_or``, and the per-round
sufficient statistic ``sum_pow2b = Σ_{v,i} 2^{b_i(v)}`` is an exact
BIGINT sum. The only float, ``reach_est = sum_pow2b / (k·0.77351)``,
is a single correctly-rounded IEEE division of that integer —
bit-identical on any engine (never pow/log of a float).

Overflow headroom: ``sum_pow2b ≤ V · k · 2^(cap+1)``; the default
cap=24 keeps int64 headroom to ~10^12 vertices · k=4 — beyond that
lower ``cap`` (documented, same pattern as katz's count bound).

Scale: edges dedupe + hash-partition ONCE on ``dst`` (the join key);
each round = 1 co-located join + 1 shuffle (the groupBy src) + 1
broadcast-free left join back; sketch table is V rows × (k+1) cols.
Per-round stats ride the SAME action that materializes the round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from ..pipeline.hashing import seeded_hash60
from .build import vertices_from_edges
from .engine import bsp_loop_confs, materialize

#: E[2^b] / |S| for Flajolet-Martin sketches (1/0.77351)
FM_PHI = 0.77351


def _rho_sql(x: str, cap: int) -> str:
    """Trailing zeros of ``x`` (= bit index to set), capped.

    ``x & -x`` isolates the lowest set bit; ``bit_count(that - 1)``
    counts the zeros below it. ``x = 0`` (probability 2^-60 per hash)
    yields bit_count(-1) = 64, clamped by ``least``.
    """
    return f"least(bit_count((({x}) & -({x})) - 1), {cap})"


def _lowest_zero_sql(s: str) -> str:
    """Index of the lowest ZERO bit of sketch ``s`` (FM's ``b``).

    ``~s`` has its lowest SET bit there; sketches only occupy bits
    [0, cap] with cap ≤ 62, so ``~s`` is never 0 and never INT64_MIN.
    """
    return f"bit_count(((~({s})) & -(~({s}))) - 1)"


def anf(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
    k: int = 4,
    cap: int = 24,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-round neighborhood function of the directed graph.

    Returns one row per round t ∈ [0, rounds]:
    ``(round, sum_pow2b, reach_est)`` where ``sum_pow2b`` is the exact
    integer ``Σ_{v,i} 2^{b_i(v)}`` over all vertices and the k
    sketches, and ``reach_est = sum_pow2b / (k · 0.77351)`` estimates
    ``N(t)`` (round 0 ≈ |V|). Follows OUT-links; pass
    ``edges ∪ reversed(edges)`` for the undirected ball.

    The result is tiny (rounds+1 rows) but computed distributed; it is
    returned as a DataFrame so it composes with the contract sinks.
    """
    if not 0 <= rounds <= 64:
        raise ValueError(f"rounds must be in [0, 64], got {rounds}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    if not 1 <= cap <= 62:
        raise ValueError(f"cap must be in [1, 62], got {cap}")
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    scols = [f"s{i}" for i in range(k)]
    with bsp_loop_confs(spark):
        e = materialize(
            edges.select("src", "dst").distinct().repartition(n_part, "dst")
        )
        sk = vertices_from_edges(e)
        for i in range(k):
            sk = (
                sk.withColumn("__h", seeded_hash60(seed * k + i, F.col("id")))
                .withColumn(
                    scols[i],
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), {_rho_sql('__h', cap)})"
                    ),
                )
                .drop("__h")
            )
        sk = materialize(sk.repartition(n_part, "id"))

        stats: list[Row] = [_round_stat(sk, 0, scols)]
        for t in range(1, rounds + 1):
            msgs = (
                e.join(sk.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(*[F.expr(f"bit_or({c})").alias(f"m{i}")
                       for i, c in enumerate(scols)])
            )
            sk = materialize(
                sk.join(msgs, "id", "left_outer")
                .select(
                    "id",
                    *[
                        (F.col(c).bitwiseOR(
                            F.coalesce(F.col(f"m{i}"), F.lit(0).cast("long"))
                        )).alias(c)
                        for i, c in enumerate(scols)
                    ],
                )
                .repartition(n_part, "id")
            )
            stats.append(_round_stat(sk, t, scols))
    out = spark.createDataFrame(
        stats, "round INT, sum_pow2b BIGINT, reach_est DOUBLE"
    )
    return out.orderBy("round")


def _round_stat(sk: DataFrame, t: int, scols: list[str]) -> Row:
    """(round, sum_pow2b, reach_est) for the current sketch table."""
    pow2 = [
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_lowest_zero_sql(c)})")
        for c in scols
    ]
    tot = pow2[0]
    for p in pow2[1:]:
        tot = tot + p
    row = sk.select(F.sum(tot).cast("long").alias("s")).collect()[0]
    s = int(row["s"] or 0)
    return Row(
        round=t, sum_pow2b=s, reach_est=s / (len(scols) * FM_PHI)
    )


def anf_effective_diameter(nf: DataFrame, q: float = 0.9) -> int:
    """Smallest t with ``N(t) ≥ q · N(t_max)`` from an ``anf`` result.

    Collects the (rounds+1)-row table driver-side — the input is
    already a per-round scalar series, not per-vertex data.
    """
    rows = sorted(nf.collect(), key=lambda r: r["round"])
    if not rows:
        raise ValueError("empty neighborhood function")
    target = q * rows[-1]["reach_est"]
    for r in rows:
        if r["reach_est"] >= target:
            return int(r["round"])
    return int(rows[-1]["round"])
