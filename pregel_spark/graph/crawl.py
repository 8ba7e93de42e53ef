"""Recrawl comparison — the ops a continuously-crawled link graph
runs between snapshots.

A production web index holds (at least) two link-graph snapshots at
any time: the serving crawl and the incoming one. The two standing
questions are "what changed in the graph?" (``crawl_delta`` — feeds
crawl scheduling and spam surface monitoring) and "whose importance
moved?" (``rank_shift`` — the rank-delta feed behind freshness
boosts and link-spam alarms; pairs naturally with
``pagerank(initial_ranks=...)`` warm starts, where the OLD snapshot's
ranks seed the NEW snapshot's iteration).

Scale: ``crawl_delta`` is one full-outer hash join on (src, dst) —
both sides shuffle once on the same key; ``rank_shift`` is two
PageRank runs (each the audited per-superstep plan) + one outer hash
join on id. Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def crawl_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """(src, dst, status) over the union of both snapshots' distinct
    arcs: 'added' (new only), 'removed' (old only), 'kept' (both)."""
    o = old.select("src", "dst").distinct().withColumn("in_old", F.lit(1))
    n = new.select("src", "dst").distinct().withColumn("in_new", F.lit(1))
    j = o.join(n, ["src", "dst"], "full_outer")
    status = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
    )
    return j.select("src", "dst", status.alias("status"))


def rank_shift(
    spark: SparkSession,
    old_edges: DataFrame,
    new_edges: DataFrame,
    max_iter: int = 3,
    d: float = 0.85,
    **kwargs,
) -> DataFrame:
    """(id, rank_old, rank_new, shift): fixed-``max_iter`` PageRank on
    each snapshot, outer-joined. Pages absent from a snapshot carry
    NULL for that side's rank and for ``shift`` (a page that appeared
    has no defined delta — callers decide how to treat births/deaths
    rather than inheriting a fake zero). ``**kwargs`` forwards
    pagerank's knobs to BOTH runs."""
    from .pagerank import pagerank

    p_old = pagerank(
        spark, old_edges, d=d, tol=0.0, max_iter=max_iter, **kwargs
    ).vertices.select("id", F.col("rank").alias("rank_old"))
    p_new = pagerank(
        spark, new_edges, d=d, tol=0.0, max_iter=max_iter, **kwargs
    ).vertices.select("id", F.col("rank").alias("rank_new"))
    return p_old.join(p_new, "id", "full_outer").select(
        "id",
        "rank_old",
        "rank_new",
        (F.col("rank_new") - F.col("rank_old")).alias("shift"),
    )
