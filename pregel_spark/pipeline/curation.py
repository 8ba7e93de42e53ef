"""Training-mix curation: deterministic stratified sampling.

Assembling an LLM training mix means sampling each stratum (language,
source, quality band) at its own rate. ``df.sample`` is partition- and
run-dependent; here membership is a PURE FUNCTION of
(id, seed, stratum rate) via the engine-portable seeded 60-bit hash
(``pipeline/hashing``, same family as ``graph.build.vertex_sample_pred``)
— so the same document keeps/drops identically across reruns,
repartitionings, engines (DuckDB twin below), and across every table
its id appears in (text, embeddings, metadata stay aligned with zero
joins).

Scale shape: one scan-time filter — the rate lookup is a literal CASE
chain compiled from the rates dict (strata counts are human-sized),
the hash is native md5 arithmetic; no shuffle, no join, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_PPM = 1_000_000


def _ppm(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * _PPM))


def stratified_sample_pred(
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> Column:
    """Boolean keep-predicate: hash(id, seed) mod 1e6 < ppm(rate of
    this row's stratum). Rates are quantized to ppm. Strata missing
    from ``rates`` use ``default_rate``."""
    from .hashing import seeded_hash60

    expr = F.lit(_ppm(default_rate))
    # build the CASE chain in sorted-key order (deterministic plan)
    for stratum in sorted(rates):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(_ppm(rates[stratum]))
        ).otherwise(expr)
    return F.pmod(seeded_hash60(seed, F.col(id_col)), F.lit(_PPM)) < expr


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Filter ``docs`` to the stratified sample (see module docstring)."""
    return docs.filter(
        stratified_sample_pred(rates, strata_col, id_col, default_rate, seed)
    )


def duckdb_stratified_sample_pred(
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`stratified_sample_pred` (oracle surface)."""
    from .hashing import duckdb_seeded_hash60

    if rates:
        case = " ".join(
            "WHEN {c} = '{s}' THEN {p}".format(
                c=strata_col, s=s.replace("'", "''"), p=_ppm(rates[s])
            )
            for s in sorted(rates)
        )
        rate_expr = f"(CASE {case} ELSE {_ppm(default_rate)} END)"
    else:  # a searched CASE needs >= 1 WHEN branch
        rate_expr = str(_ppm(default_rate))
    return f"(({duckdb_seeded_hash60(seed, id_col)}) % {_PPM}) < {rate_expr}"


def curate_corpus(
    spark,
    docs: DataFrame,
    allowed_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_quality: float = 0.5,
    max_top2_frac: float = 0.5,
    near_dup_threshold: float = 0.1,
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end corpus curation verdicts — the composition row that
    chains the repo's pipeline operators into the keep/drop decision a
    training-data build actually ships: (doc_id, keep, reason), one
    row per document, ``reason`` the FIRST failing rule in this pinned
    priority order (auditable and engine-reproducible):

        exact_dup > near_dup > lang > too_short > too_long >
        low_quality > repetitive > ok

    Rules: exact_dup = not the min-id of its md5(text) group;
    near_dup = not the keeper of its transitive n-gram-Jaccard cluster
    (``dedup.near_dup_clusters`` — pairs via inverted index, closure
    via the graph engine's star-CC); lang = ``language_id`` prediction
    not in ``allowed_langs``; length/quality/repetition thresholds
    compare values whose computation is bit-deterministic in any
    engine (integer ratios and fixed-order scalar arithmetic), so the
    verdicts carry no rounding ambiguity.

    Scale: every input is an existing linear-cost operator; the joins
    are all on ``doc_id`` (one co-partitioned shuffle family); nothing
    here adds a new quadratic or skew surface.
    """
    from .dedup import near_dup_clusters
    from .textstats import language_id, quality_score, repetition_stats

    # NULL text = empty document (all NULL-text docs are exact
    # duplicates of each other under md5('')); without this, NULL rows
    # would fall out of the inner-join chain and get NO verdict at all
    docs = docs.select(
        F.col(id_col).alias(id_col),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        *[c for c in docs.columns if c not in (id_col, "text")],
    )
    d = docs.select(F.col(id_col).alias("doc_id"), "text")
    ex = d.select("doc_id", F.md5("text").alias("h")).withColumn(
        "keep_id", F.min("doc_id").over(Window.partitionBy("h"))
    )
    nd = near_dup_clusters(
        spark, docs, threshold=near_dup_threshold, id_col=id_col
    ).select(F.col(id_col).alias("doc_id"), F.col("keep").alias("nd_keep"))
    lang = language_id(docs, id_col).select(
        F.col(id_col).alias("doc_id"), "lang_pred"
    )
    q = quality_score(docs, id_col).select(
        F.col(id_col).alias("doc_id"), "n_tokens", "quality"
    )
    rep = repetition_stats(docs, ns=(2,), id_col=id_col).select(
        "doc_id", "top2_frac"
    )
    j = (
        ex.join(nd, "doc_id")
        .join(lang, "doc_id")
        .join(q, "doc_id")
        .join(rep, "doc_id")
    )
    reason = (
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("exact_dup"))
        .when(~F.col("nd_keep"), F.lit("near_dup"))
        .when(~F.col("lang_pred").isin(*allowed_langs), F.lit("lang"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(F.col("top2_frac") > max_top2_frac, F.lit("repetitive"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "doc_id", reason.alias("reason"), (reason == "ok").alias("keep")
    ).select("doc_id", "keep", "reason")
