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


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    alpha: float = 1.0,
    ns: tuple[int, ...] = (1, 2),
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-n-gram bag is under the
    TARGET distribution than under the RAW distribution —
    ``logratio = Σ_b n_doc[b] · ln p̂_target(b)/p̂_raw(b)`` — the
    standard recipe for tilting a web crawl toward a high-quality
    target corpus (Wikipedia, books, curated reference text).

    Features are word n-gram instances (``ns``, with multiplicity,
    the repo tokenizer spec) hashed into ``buckets`` buckets with the
    engine-portable seeded 60-bit md5 hash (``pipeline/hashing``), so
    the whole score is a pure function of the two corpora — identical
    across runs, partitionings, and engines. Bucket probabilities use
    add-``alpha`` smoothing; each bucket's log-ratio is ONE ``ln`` of
    an exactly-computed ratio, ``ln(((ct+α)·(Tr+αB)) / ((cr+α)·(Tt+αB)))``
    (counts are BIGINT-exact; the products stay integer-exact in
    double below 2^53 — fine for any per-bucket census this side of
    ~10^7 docs/bucket; contract rows round at 6 decimals which also
    absorbs the documented 1-ulp ``ln`` gap between engines). Docs are
    scored against the raw fit of ``docs`` ITSELF, so every scored
    bucket exists in the raw census (no missing-key epsilon).

    Returns (doc_id, n_feats, logratio); zero-feature docs score 0.0.

    Scale shape: two explode+census passes whose outputs are
    BUCKETS-sized (kilobytes — the map-side partial agg collapses each
    partition to ≤``buckets`` rows), one (doc, bucket) pre-aggregation,
    then a broadcast join of the bucket log-ratio table onto it and a
    per-doc sum. Linear in corpus tokens, one doc-keyed shuffle; the
    target corpus is streamed once, never collected.
    """
    from .hashing import seeded_hash60
    from .textstats import _gram_instances, _tokens

    def feats(df, idc):
        toks = df.select(F.col(idc).alias("doc_id"), _tokens().alias("w"))
        grams = toks.select(
            "doc_id",
            F.explode(
                F.flatten(F.array(*[_gram_instances(F.col("w"), n) for n in ns]))
            ).alias("g"),
        )
        return grams.select(
            "doc_id", F.pmod(seeded_hash60(seed, F.col("g")), F.lit(buckets)).alias("b")
        )

    raw = feats(docs, id_col)
    tgt = feats(target, id_col)
    cr = raw.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    ct = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    tr = raw.count()
    tt = tgt.count()
    # bucket log-ratio table: <= buckets rows, broadcast onto the doc rollup
    lr = (
        cr.join(ct, "b", "left")
        .select(
            "b",
            F.log(
                (
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                    * F.lit(float(tr) + alpha * buckets)
                )
                / (
                    (F.col("cr") + F.lit(alpha))
                    * F.lit(float(tt) + alpha * buckets)
                )
            ).alias("lr"),
        )
    )
    per_doc = (
        raw.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("lr")).alias("logratio"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("logratio", F.lit(0.0)).alias("logratio"),
        )
    )


def resample_top_frac(
    weights: DataFrame,
    frac: float,
    temperature: float = 1.0,
    seed: int = 1,
    n_rows: int | None = None,
) -> DataFrame:
    """DSIR's Gumbel-top-k resampling step, determinized: keep the
    ``frac`` fraction of docs with the largest
    ``logratio/temperature + Gumbel(doc_id, seed)``, where the Gumbel
    noise is derived from the portable seeded hash
    (``u = (hash mod 1e6 + 0.5)/1e6``, ``g = -ln(-ln u)``) — sampling
    without replacement from the softmax-tilted distribution, yet a
    pure function of (doc_id, seed) like everything else in this
    module. ``TakeOrdered`` keeps k rows per partition; never a full
    sort. Ties (astronomically unlikely) break by doc_id via the sort
    key. Returns the kept (doc_id, n_feats, logratio) rows."""
    from .hashing import seeded_hash60

    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    n = n_rows if n_rows is not None else weights.count()
    k = max(1, int(n * frac))
    u = (
        F.pmod(seeded_hash60(seed, F.col("doc_id").cast("string")), F.lit(_PPM))
        + F.lit(0.5)
    ) / F.lit(float(_PPM))
    key = F.col("logratio") / F.lit(temperature) - F.log(-F.log(u))
    return (
        weights.withColumn("_k", key)
        .orderBy(F.desc("_k"), F.asc("doc_id"))
        .limit(k)
        .drop("_k")
    )


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
