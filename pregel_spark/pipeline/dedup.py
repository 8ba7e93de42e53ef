"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- *exact*: one hash-groupBy shuffle (map-side partial agg).
- *n-gram Jaccard*: candidate pairs via an inverted shingle index
  (explode + self-join on shingle) — never all-pairs; frequent-shingle
  blowup is capped by ``max_shingle_df`` (drop shingles whose document
  frequency exceeds it — they carry no dedup signal, exactly the
  stopword-posting cutoff classic near-dup pipelines use).
- *MinHash+LSH*: signatures fully native (``transform`` + ``xxhash64``
  + ``array_min`` inside codegen), banded bucketing joins only
  same-bucket docs; verification re-checks true shingle Jaccard.
- *SimHash*: 64-bit fingerprints fully native (explode tokens, two
  32-bit md5-quarter hashes per token in codegen, 64 per-bit vote
  ``sum()`` columns in ONE aggregation, shiftleft/bitwiseOR packing —
  zero Python in the row path); candidate pairs by pigeonhole
  bit-banding, then exact Hamming verify via native
  ``bit_count(a ^ b)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


# ------------------------------ shared -------------------------------

def tokens_col(col: str = "text") -> Column:
    return F.when(
        F.length(F.trim(F.col(col))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(col)), r"\s+"))


def shingles_col(k: int = 3, col: str = "text") -> Column:
    """Distinct word k-gram shingles as array<string>."""
    toks = tokens_col(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(-1)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(sh)
    )


# ------------------------------ exact --------------------------------

def exact_dedup(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Hash-group exact dedup: (h, keep_id = min id, n_dups)."""
    return (
        docs.select(F.md5(F.col("text")).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n"))
    )


def incremental_exact(
    new_docs: DataFrame,
    base: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_is_fingerprints: bool = False,
) -> DataFrame:
    """Dedup a NEW crawl batch against an existing corpus: the recrawl
    pattern where the base corpus is already ingested and only the
    delta must be screened (the reference replays the full loader for
    this, `pregel/loader.lua` flush cycle; here it is one anti-join).

    Returns the surviving new docs as ``(id, h)``: not an exact-text
    match of any base doc, and the min-id representative within the
    new batch itself (intra-batch exact dups collapse too).

    ``base_is_fingerprints=True`` accepts a precomputed ``(h)`` table —
    at 100 TB you store md5 fingerprints once at ingest (32 bytes/doc,
    ~3 TB for 10^11 docs) instead of re-hashing the corpus per batch;
    the anti-join then shuffles fingerprints only, never base text.
    """
    h = F.md5(F.col(text_col))
    base_h = (
        base.select("h") if base_is_fingerprints
        else base.select(h.alias("h"))
    ).distinct()
    fresh = (
        new_docs.select(h.alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
    )
    return fresh.join(base_h, "h", "left_anti").select(id_col, "h")


# -------------------------- n-gram Jaccard ---------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    max_shingle_df: int = 100,
) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard >= threshold.

    Inverted-index join: |pairs| bounded by sum over shingles of df²,
    with df capped at ``max_shingle_df``.

    The distinct shingle table is checkpointed once: it feeds the doc
    sizes, the df census, and BOTH sides of the inverted-index
    self-join — unmaterialized, Spark re-runs the tokenize+explode+
    distinct subtree for every reference (measured 6 Generate(explode)
    nodes, zero ReusedExchange, in one plan). The capped posting list
    (``rare``) is checkpointed too so the census and semi-join run
    once, not once per self-join side. Both tables are
    corpus-shingle-sized — the same rows a 100 TB run would persist
    anyway before a 6-fold rescan.
    """
    from ..graph.engine import materialize

    sh = materialize(
        docs.select(
            F.col(id_col).alias("id"), F.explode(shingles_col(k)).alias("sh")
        ).distinct()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    rare = materialize(
        sh.join(
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("sh"),
            "sh",
            "left_semi",
        )
    )
    a = rare.select(F.col("sh"), F.col("id").alias("a"))
    b = rare.select(F.col("sh"), F.col("id").alias("b"))
    inter = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    max_shingle_df: int = 100,
) -> DataFrame:
    """Directional shingle containment: rows ``(inner_id, outer_id,
    containment)`` where ``containment = |S(inner) ∩ S(outer)| /
    |S(inner)| >= threshold`` (inner != outer). Jaccard misses the
    quote-inclusion / boilerplate-wrap case — a short doc fully
    embedded in a long one has tiny Jaccard but containment 1.0 —
    which is the dominant near-dup mode in webtext (syndicated
    articles inside portal pages, quoted posts, licence preambles).

    Same inverted-shingle-index candidate generation as
    :func:`ngram_jaccard_pairs` (one unordered intersection count per
    candidate pair, mirrored into both directions only at the final
    filter), same ``max_shingle_df`` posting-list cutoff — so cost and
    the 100 TB story are identical to the Jaccard path: never
    all-pairs, bounded by sum over shingles of df². The cutoff's
    effect (pairs sharing only stop-shingles undercount) is shared
    with the Jaccard operator and replicated exactly by the oracle.
    """
    # same multi-reference checkpoints as ngram_jaccard_pairs (the
    # shingle table feeds sizes/census/both self-join sides; here the
    # union below additionally references the intersection counts
    # twice, which would re-run the whole index join per direction)
    from ..graph.engine import materialize

    sh = materialize(
        docs.select(
            F.col(id_col).alias("id"), F.explode(shingles_col(k)).alias("sh")
        ).distinct()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    rare = materialize(
        sh.join(
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("sh"),
            "sh",
            "left_semi",
        )
    )
    a = rare.select(F.col("sh"), F.col("id").alias("a"))
    b = rare.select(F.col("sh"), F.col("id").alias("b"))
    inter = materialize(
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    both = inter.select("a", "b", "inter").unionByName(
        inter.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "inter"
        )
    )
    return (
        both.join(sizes.withColumnRenamed("id", "a"), "a")
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.col("sz").cast("double"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("a").alias("inner_id"),
            F.col("b").alias("outer_id"),
            "containment",
        )
    )


# --------------------------- MinHash + LSH ---------------------------

def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    k: int = 3,
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, sig array<long>) — sig[i] = min over shingles of
    H(i, shingle). With ``hash_fn='md5'`` (default) H is engine-portable:
    hash i is the i%4-th 32-bit quarter (8 hex chars) of
    ``md5("<i//4>:" || shingle)`` — four independent 32-bit hashes per
    digest; any SQL engine reproduces the signatures exactly (the
    DuckDB unroll in ``__spark_entry__._minhash_sql`` is the spec).
    ``hash_fn='xxhash64'`` switches to Spark-internal
    ``xxhash64(i, shingle)`` for max throughput (not externally
    reproducible).

    Shape: explode shingles to rows, then ONE aggregation with
    ``num_hashes`` min() functions. (A pure-expression variant —
    ``array(*[array_min(transform(shingles, ...))])`` — inlines the
    shingle subexpression ``num_hashes`` times after projection
    collapse: measured 75s for 500 docs vs <2s for this shape.) The
    explode also keeps rows narrow at 100 TB: partial aggregation
    collapses each map partition to one row per doc before the
    shuffle."""
    if hash_fn == "md5":
        # one md5 digest yields FOUR independent 32-bit hashes (8 hex
        # chars each) — 32-bit minhash values lose nothing (the min-hash
        # estimator only needs a uniform hash; within-set collision odds
        # are ~|shingles|²/2³³) and quarter the digest count vs one
        # digest per hash
        def h(i):
            d = F.md5(F.concat(F.lit(f"{i // 4}:"), F.col("sh")))
            return F.conv(
                F.substring(d, (i % 4) * 8 + 1, 8), 16, 10
            ).cast("long")
    else:
        def h(i):
            return F.xxhash64(F.lit(i), F.col("sh"))

    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(k)).alias("sh")
    )
    # pre-project the hash columns: aggregate-input expressions are not
    # reliably subexpression-eliminated across the num_hashes min()s, so
    # evaluating the md5 digests once in an explicit projection halves
    # the digest count and leaves the aggregation over plain longs
    hashed = sh.select(
        "id", *[h(i).alias(f"_h{i}") for i in range(num_hashes)]
    )
    return hashed.groupBy("id").agg(
        F.array(*[F.min(f"_h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate pairs from banded MinHash buckets, verified against
    true shingle Jaccard. Returns (a, b, jaccard) with a < b."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, k, id_col, hash_fn).filter(
        F.col("sig").isNotNull()
    )
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", bi * r + j + 1) for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    # verify: true Jaccard on shingle sets for candidates only
    sh = docs.select(
        F.col(id_col).alias("id"), shingles_col(k).alias("shs")
    )
    verified = (
        cand.join(sh.withColumnRenamed("id", "a").withColumnRenamed("shs", "sha"), "a")
        .join(sh.withColumnRenamed("id", "b").withColumnRenamed("shs", "shb"), "b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sha") + F.size("shb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return verified


# ------------------------- embedding near-dup ------------------------

def embedding_near_dup_pairs(
    embs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "auto",
    bands: int = 16,
    rows_per_band: int = 2,
    seed: int = 42,
    exact_limit: int = 8_000,
    n_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold (a < b).

    ``mode='exact'``: all-pairs — the correctness baseline, O(n²)
    candidate pairs, acceptable only for small n (the cross join
    broadcasts one side). ``mode='lsh'``: the scale path — banded
    sign-LSH: ``bands`` independent bands of ``rows_per_band``
    deterministic pseudo-random hyperplanes each (seeded hash-derived,
    no stored model); a pair is a candidate iff ALL signs in SOME band
    agree, then candidates are exact-verified, so precision is always 1
    and recall is 1-(1-p^r)^b with p = 1-θ/π (defaults give 0.9997 at
    cosine 0.4, higher above). ``mode='auto'`` (default) picks exact
    for n <= ``exact_limit`` and lsh above — the cartesian can never
    reach a large input (pass ``n_rows`` to skip the count job).

    ``exact_limit`` rationale: exact evaluates n²/2 dot products vs
    LSH's ~32n hash projections + verified bucket collisions, so the
    break-even is where n/2 ≈ 32 + (collision factor) — order 10²-10³
    rows, not 10⁴. 8000 (3.2e7 candidate pairs, ~1-2 s on 32 cores for
    short vectors) is a conservative ceiling chosen so the exact path
    is never catastrophically wrong while small inputs skip the LSH
    constant costs; at 20k the boundary cartesian was already 2x10⁸
    pairs.
    """
    from pyspark.sql import functions as FF

    norm = FF.sqrt(
        FF.aggregate(
            FF.transform(FF.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            FF.lit(0.0),
            lambda a, x: a + x,
        )
    )
    base = embs.select(
        FF.col(id_col).alias("id"), FF.col(vec_col).alias("v"), norm.alias("nrm")
    )
    if mode == "auto":
        n = n_rows if n_rows is not None else embs.count()
        mode = "exact" if n <= exact_limit else "lsh"
    if mode == "lsh":
        # hyperplane p: component i = hash(seed, p, i) mapped to
        # [-0.5, 0.5); sign bit = (v · plane_p) >= 0. Band key packs
        # rows_per_band sign bits.
        def sign_bit(p: int):
            proj = FF.aggregate(
                FF.transform(
                    FF.col("v"),
                    lambda x, i: x.cast("double")
                    * (
                        FF.pmod(
                            FF.xxhash64(FF.lit(seed), FF.lit(p), i), FF.lit(1000)
                        )
                        / 1000.0
                        - 0.5
                    ),
                ),
                FF.lit(0.0),
                lambda a, x: a + x,
            )
            return FF.when(proj >= 0, FF.lit(1)).otherwise(FF.lit(0))

        banded = base.select(
            "id",
            "v",
            "nrm",
            FF.explode(
                FF.array(
                    *[
                        FF.struct(
                            FF.lit(b).alias("band"),
                            sum(
                                sign_bit(b * rows_per_band + j) * (1 << j)
                                for j in range(rows_per_band)
                            ).alias("key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select("id", "v", "nrm", "bk.band", "bk.key")
        a = banded.select(
            FF.col("id").alias("a"), FF.col("v").alias("va"),
            FF.col("nrm").alias("na"), "band", "key",
        )
        b = banded.select(
            FF.col("id").alias("b"), FF.col("v").alias("vb"),
            FF.col("nrm").alias("nb"), "band", "key",
        )
        cand = (
            a.join(b, ["band", "key"])
            .filter(FF.col("a") < FF.col("b"))
            .select("a", "b", "va", "vb", "na", "nb")
            .dropDuplicates(["a", "b"])
        )
    elif mode == "exact":
        a = base.select(
            FF.col("id").alias("a"), FF.col("v").alias("va"), FF.col("nrm").alias("na")
        )
        b = base.select(
            FF.col("id").alias("b"), FF.col("v").alias("vb"), FF.col("nrm").alias("nb")
        )
        cand = a.join(b, FF.col("a") < FF.col("b"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    dot = FF.aggregate(
        FF.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        FF.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.select(
            "a", "b",
            FF.round(dot / (FF.col("na") * FF.col("nb")), 6).alias("cosine"),
        )
        .filter(FF.col("cosine") >= threshold)
    )


# -------------------------- near-dup clusters ------------------------

def near_dup_clusters(
    spark,
    docs: DataFrame,
    threshold: float = 0.1,
    k: int = 3,
    id_col: str = "doc_id",
    max_shingle_df: int = 100,
) -> DataFrame:
    """Transitive near-duplicate clusters: n-gram-Jaccard pairs are
    edges, clusters are their connected components, and the canonical
    keeper of each cluster is its minimum doc id (the standard
    keep-one-per-cluster dedup policy — pairs alone under-delete when
    A~B and B~C but A!~C). Returns (doc_id, cluster_id, keep) covering
    EVERY document (singletons form their own cluster).

    Composition showcase: the pair generation is the pipeline's
    inverted-index join and the closure is the graph engine's O(log n)
    alternating-star connected components — numeric doc ids ride
    through zero-padded strings so the engine's lexicographic min-label
    equals the numeric min. 19-digit padding covers every non-negative
    64-bit long; negative ids would reverse lexicographic order ('-'
    prefix), so they fail fast.
    """
    from ..graph import connected_components_star

    mn = docs.agg(F.min(F.col(id_col).cast("long")).alias("mn")).first()["mn"]
    if mn is not None and mn < 0:
        raise ValueError(
            f"near_dup_clusters requires non-negative {id_col} values "
            f"(min seen: {mn}); lexicographic min-label would not equal "
            "the numeric min for negative ids"
        )
    pairs = ngram_jaccard_pairs(docs, threshold, k, id_col, max_shingle_df)
    # Materialize the pair table BEFORE the CC loop: star-CC's setup
    # scans its edge input several times (vertex extraction, the two
    # id-map joins, symmetrize), and each scan would otherwise re-run
    # the whole inverted-index pair generation — measured ~2x the total
    # near_dup_clusters wall at sf0.1. The pair table is the near-dup
    # edge set (orders of magnitude smaller than the corpus), so the
    # checkpoint is cheap at any scale.
    from ..graph.engine import materialize

    edges = materialize(
        pairs.select(
            F.format_string("%019d", F.col("a")).alias("src"),
            F.format_string("%019d", F.col("b")).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    labels = connected_components_star(spark, edges).vertices.select(
        F.col("id").cast("long").alias(id_col),
        F.col("component").cast("long").alias("cluster_id"),
    )
    return (
        docs.select(id_col)
        .join(labels, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


# ------------------------------ SimHash ------------------------------

def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, fp long) — 64-bit SimHash, 100% native (no Python row path).

    Token hash = two 32-bit md5 quarters (bits 0-31 from hex chars 1-8,
    bits 32-63 from chars 9-16), same engine-portable scheme as the
    MinHash family (``pipeline/hashing.py``): DuckDB/Postgres reproduce
    every fingerprint bit-exactly via
    ``('0x' || substr(md5(tk), 1, 8))::UBIGINT``, and md5-of-VARCHAR
    hashes UTF-8 bytes on both engines, so non-ASCII corpora match too.

    Shape: explode tokens -> pre-project the two quarter hashes (one
    md5 per token) -> ONE aggregation of 64 per-bit vote columns
    ``sum(2*bit - 1)`` (map-side partial agg collapses each partition
    to one row per doc before the shuffle) -> pack sign bits with
    ``shiftleft``/``bitwiseOR``. Tie votes (sum == 0) pack bit 0.
    Empty/NULL docs fingerprint to 0 via the left join.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col("text")).alias("tk")
    )
    d = F.md5("tk")
    hashed = toks.select(
        "id",
        F.conv(F.substring(d, 1, 8), 16, 10).cast("long").alias("h0"),
        F.conv(F.substring(d, 9, 8), 16, 10).cast("long").alias("h1"),
    )
    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.shiftright(F.col(f"h{b // 32}"), b % 32)
                .bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    fp = None
    for b in range(64):
        term = F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp.bitwiseOR(term)
    fps = votes.select("id", fp.alias("fp"))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(fps, "id", "left_outer")
        .select("id", F.coalesce("fp", F.lit(0).cast("long")).alias("fp"))
    )


def simhash_bands(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) bit-bands for pigeonhole candidate generation:
    ``max_hamming + 1`` contiguous bands covering the 64 fingerprint
    bits (widths differ by at most one). Any pair within Hamming
    ``max_hamming`` has <= max_hamming differing bits spread over
    ``max_hamming + 1`` bands, so at least one band matches exactly —
    recall over candidates is 1 by construction for EVERY
    ``max_hamming`` (a fixed 4x16 split only guarantees Hamming <= 3)."""
    n_bands = min(max_hamming + 1, 64)
    base, extra = divmod(64, n_bands)
    bands, shift = [], 0
    for c in range(n_bands):
        width = base + (1 if c < extra else 0)
        bands.append((shift, width))
        shift += width
    return bands


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs with Hamming(fp_a, fp_b) <= max_hamming.

    Pigeonhole banding on ``max_hamming + 1`` bit-bands (see
    :func:`simhash_bands`) guarantees every qualifying pair shares at
    least one band, so the join touches only same-band buckets; exact
    distance check via native ``bit_count(xor)``. Note the scale
    trade-off is inherent to SimHash: large ``max_hamming`` means
    narrow bands (64/(h+1) bits), hence bigger buckets — pick
    ``max_hamming`` <= ~7 (8-bit bands) for web-scale corpora.
    """
    fps = simhash_fingerprints(docs, id_col)
    chunks = fps.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("fp", shift)
                        # width 64 (max_hamming=0): mask is all-ones = -1L
                        .bitwiseAND(
                            F.lit((1 << width) - 1 if width < 64 else -1)
                        )
                        .alias("key"),
                    )
                    for c, (shift, width) in enumerate(simhash_bands(max_hamming))
                ]
            )
        ).alias("cb"),
    ).select("id", "fp", "cb.chunk", "cb.key")
    # Hamming-filter BEFORE dedup: bit_count is a register op evaluated
    # on the (possibly duplicated) join output, while distinct shuffles
    # every surviving row — filtering first cuts the distinct's input
    # from O(candidates) to O(result) (narrow bands at high max_hamming
    # make candidates >> results).
    return (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.bit_count(F.col("x.fp").bitwiseXOR(F.col("y.fp"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
