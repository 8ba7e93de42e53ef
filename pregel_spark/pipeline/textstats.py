"""Text analysis over document tables — 100% native column expressions
(JVM-side, whole-stage codegen; zero Python in the row path).

Tokenization is pinned as whitespace splitting of the trimmed text —
simple enough to be bit-reproducible in any engine (the DuckDB oracles
in __spark_entry__.py run the same logic), fast enough for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est", "un"],
    "es": ["el", "la", "y", "de", "que", "los", "es"],
}

PUNCT_RE = "[.!?,;:]"

# BPE-ish pre-tokenizer classes (letters / digits / other-symbol runs) —
# kept to RE2-portable constructs (no lookahead) so the DuckDB oracle
# runs the identical pattern
SUBWORD_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


def _tokens(col: str = "text") -> Column:
    return F.when(
        F.length(F.trim(F.col(col))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(col)), r"\s+"))


def token_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_subwords, n_chars, avg_token_len).

    ``n_tokens`` = whitespace tokens; ``n_subwords`` = BPE-style
    pre-tokenizer units (letter / digit / symbol runs) — the standard
    cheap token-budget proxy for training-data accounting."""
    toks = _tokens()
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(SUBWORD_RE), F.lit(0))
        ).alias("n_subwords"),
        F.length("text").alias("n_chars_text"),
        F.round(
            F.coalesce(
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.greatest(F.size(toks), F.lit(1)),
                F.lit(0.0),
            ),
            6,
        ).alias("avg_token_len"),
    )


def _stop_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def quality_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality in [0,1]: length signal + punctuation sanity +
    stopword-density signal (pinned formula, mirrored by the oracle)."""
    toks = _tokens()
    n_tok = F.size(toks)
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_RE), F.lit(0)))
    punct_ratio = punct / F.greatest(F.length("text"), F.lit(1)).cast("double")
    stop_ratio = _stop_hits(toks, STOPWORDS["en"]) / F.greatest(
        n_tok, F.lit(1)
    ).cast("double")
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(50.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10))
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * 5)
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID; ties and zero votes -> 'und'.
    Deterministic: argmax over (votes desc, lang asc)."""
    toks = _tokens()
    langs = sorted(STOPWORDS)
    voted = docs.select(
        F.col(id_col),
        *[_stop_hits(toks, STOPWORDS[lg]).alias(f"v_{lg}") for lg in langs],
    )
    best = F.greatest(*[F.col(f"v_{lg}") for lg in langs])
    pick = F.when(best == 0, F.lit("und"))
    for lg in langs:  # asc order -> first match wins ties
        pick = pick.when(F.col(f"v_{lg}") == best, F.lit(lg))
    return voted.select(F.col(id_col), pick.alias("lang_pred"))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al.): hash every character
    k-gram, min-sample one hash per sliding window of ``window``
    consecutive k-grams, dedup. Robust to insertions/shifts — two
    documents sharing a long-enough substring share fingerprints.
    Documents shorter than ``k`` characters (incl. empty/null) have no
    k-grams and therefore NO fingerprints — guarded explicitly because
    ``sequence(1, 0)`` would otherwise auto-descend to ``[1, 0]`` and
    fabricate grams for short docs.

    Shape: explode per-position k-gram hashes to rows, min-sample with
    a bounded ROWS window frame, dedup — no per-row array expression
    re-inlining (the projection-collapse trap, see minhash) and the
    windowed min is a partition-local streaming pass. Returns
    (doc_id, fp long) exploded — the natural shape for an inverted
    fingerprint index at scale.

    ``hash_fn='md5'`` (default) uses the engine-portable 60-bit hash
    (hashing.py) so external oracles reproduce fingerprints exactly;
    ``'xxhash64'`` trades that for max throughput.
    """
    from pyspark.sql import Window

    from .hashing import hash60

    gram_hash = hash60 if hash_fn == "md5" else F.xxhash64
    n_grams = F.greatest(F.length("text") - F.lit(k - 1), F.lit(0))
    gram_arr = F.when(n_grams < 1, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: gram_hash(F.col("text").substr(i, F.lit(k))),
        )
    )
    grams = docs.select(
        F.col(id_col),
        F.posexplode(gram_arr).alias("pos", "h"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        grams.select(F.col(id_col), F.min("h").over(w).alias("fp"))
        .distinct()
    )


def winnow_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    max_fp_df: int = 100,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup pairs by winnowing-fingerprint overlap (a < b):
    overlap = |fp(a) ∩ fp(b)| / min(|fp(a)|, |fp(b)|) >= threshold.

    Inverted-index join on shared fingerprints (never all-pairs);
    fingerprints appearing in more than ``max_fp_df`` documents carry
    no dedup signal and are dropped (same posting-list cutoff as
    ngram_jaccard_pairs).
    """
    fps = winnow_fingerprints(docs, k, window, id_col, hash_fn).withColumnRenamed(
        id_col, "id"
    )
    sizes = fps.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    rare = fps.join(
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_fp_df)
        .select("fp"),
        "fp",
        "left_semi",
    )
    inter = (
        rare.select("fp", F.col("id").alias("a"))
        .join(rare.select("fp", F.col("id").alias("b")), "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "overlap",
            F.round(
                F.col("inter") / F.least("sza", "szb").cast("double"), 6
            ),
        )
        .filter(F.col("overlap") >= threshold)
        .select("a", "b", "overlap")
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed
    text — the canonical-form hash used for exact near-layout dedup."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select(F.col(id_col), F.md5(norm).alias("fp"))


def _gram_instances(w: Column, n: int) -> Column:
    """ALL word n-gram instances (with multiplicity, unlike
    ``dedup.shingles_col`` which dedups) — repetition measures need
    the multiset."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    # sequence(0, -1) DESCENDS — short docs need the explicit empty
    # branch (the same guard as dedup.shingles_col; regression-tested
    # there at test_pipeline.py's short-doc cases)
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(grams)


def top_ngrams(
    docs: DataFrame, n: int = 2, k: int = 20, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide top-k word n-grams by total occurrence count (with
    multiplicity): ``(ngram, n_occurrences, n_docs)``.

    The LM-data diagnostic for boilerplate discovery — the head of this
    distribution IS the candidate line-dedup/blocklist input.

    Deterministic: ties break by ngram ascending, so the k-th boundary
    is stable. Scale: explode + one groupBy (partial agg collapses the
    hot grams map-side); the top-k is a ``TakeOrderedAndProject`` —
    each partition keeps k rows, only k*n_part rows reach the driver
    stage, never a full sort.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(_gram_instances(_tokens(), n)).alias("ngram"),
    )
    counted = grams.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    return counted.orderBy(
        F.desc("n_occurrences"), F.asc("ngram")
    ).limit(k)


def repetition_stats(
    docs: DataFrame, ns: tuple[int, ...] = (2, 3), id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1): the
    quality rules that catch boilerplate, keyword-stuffed and
    degenerate-generation documents.

    Per document: (doc_id, n_tokens, n_lines, dup_line_frac,
    dup_line_char_frac, top{n}_frac, dup{n}_frac for each n in ``ns``)
    where

    - ``dup_line_frac``: fraction of line instances (split on '\\n',
      untrimmed) whose exact text occurs more than once in the doc;
      ``dup_line_char_frac``: same weighted by line characters;
    - ``top{n}_frac``: occurrences of the most frequent word n-gram /
      total n-gram instances;
    - ``dup{n}_frac``: fraction of n-gram instances whose gram occurs
      >= 2 times.

    Deviation from the paper, pinned for engine portability: fractions
    are over token/line INSTANCES rather than characters for the
    n-gram measures (the character weighting adds nothing once grams
    are whitespace-joined, and the instance version is exactly
    reproducible in any engine). Documents with no n-grams (shorter
    than n tokens) report 0.0. All-native columns; per n, one explode
    + one (doc, gram) partial-agg shuffle + one per-doc agg — the same
    map-side-combine shape as ``term_index``, linear in corpus tokens.
    """
    # NULL text is treated as the empty document — without the
    # coalesce, split(NULL) yields a NULL array, explode drops the
    # row, and the doc would silently vanish from the output
    txt = F.coalesce(F.col("text"), F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(F.trim(txt)) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.trim(txt), r"\s+"))
        .alias("w"),
        F.split(txt, "\n").alias("lines"),
    )
    lines = base.select("doc_id", F.explode("lines").alias("ln"))
    lc = lines.groupBy("doc_id", "ln").agg(F.count(F.lit(1)).alias("c"))
    zero = F.lit(0).cast("long")
    line_stats = lc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(zero)).alias("dupl"),
        F.sum(F.col("c") * F.length("ln")).alias("chars"),
        F.sum(
            F.when(F.col("c") >= 2, F.col("c") * F.length("ln")).otherwise(zero)
        ).alias("dupchars"),
    )
    out = base.select("doc_id", F.size("w").cast("long").alias("n_tokens")).join(
        line_stats.select(
            "doc_id",
            "n_lines",
            (F.col("dupl") / F.col("n_lines")).alias("dup_line_frac"),
            F.when(F.col("chars") > 0, F.col("dupchars") / F.col("chars"))
            .otherwise(F.lit(0.0))
            .alias("dup_line_char_frac"),
        ),
        "doc_id",
    )
    for n in ns:
        grams = base.select("doc_id", F.explode(_gram_instances(F.col("w"), n)).alias("g"))
        cnt = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        agg = cnt.groupBy("doc_id").agg(
            F.max("c").alias("top"),
            F.sum("c").alias("tot"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(zero)).alias("dup"),
        )
        stats = agg.select(
            "doc_id",
            (F.col("top") / F.col("tot")).alias(f"top{n}_frac"),
            (F.col("dup") / F.col("tot")).alias(f"dup{n}_frac"),
        )
        out = (
            out.join(stats, "doc_id", "left")
            .withColumn(f"top{n}_frac", F.coalesce(f"top{n}_frac", F.lit(0.0)))
            .withColumn(f"dup{n}_frac", F.coalesce(f"dup{n}_frac", F.lit(0.0)))
        )
    return out


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus-unigram language-model score — the classic cheap
    gibberish/outlier detector (the poor man's perplexity filter):
    fit p(w) = count(w)/total over the WHOLE corpus, then score each
    document by its mean token log-probability. Rare-vocabulary
    documents (mojibake, base64 blobs, lorem noise) sit far below the
    corpus mode. No smoothing is needed: every scored token is in the
    corpus by construction (the doc itself contributes), so p(w) > 0.

    Returns (doc_id, n_tokens, mean_logprob); zero-token docs report
    0.0 (no tokens to score). Scale: one explode feeding (a) the
    global (term, count) table — vocabulary-sized, map-side combined —
    and (b) the per-doc score join keyed on term; corpus totals ride a
    1-row broadcast cross join. Linear in corpus tokens.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), _tokens().alias("w"))
    inst = toks.select("doc_id", F.explode("w").alias("term"))
    tc = inst.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = inst.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    scored = (
        inst.join(tc, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.avg(F.log(F.col("c") / F.col("n_total"))).alias("mean_logprob"))
    )
    return (
        toks.select("doc_id", F.size("w").cast("long").alias("n_tokens"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("mean_logprob", F.lit(0.0)).alias("mean_logprob"),
        )
    )


# PII patterns, pinned to constructs that behave identically under
# Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4s": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "intl_phones": r"\+[0-9]{7,15}",
}


def pii_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document PII-pattern hit counts (emails, dotted-quad IPs,
    international-format phone numbers) — the scrubbing/redaction
    signal every web-scale training pipeline computes before release.
    Detection only (counts); redaction policy is the caller's.
    All-native ``regexp_count`` at the scan, zero shuffles."""
    out = docs.select(F.col(id_col).alias("doc_id"), "text")
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(name, F.regexp_count(F.col("text"), F.lit(pat)))
    return out.drop("text")


def pmi_ngrams(
    docs: DataFrame, min_count: int = 5, k: int = 20, id_col: str = "doc_id"
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information —
    Church & Hanks 1990's association measure, the corpus-analysis
    step that separates real collocations ("Hong Kong") from merely
    frequent pairs ("of the"):

        pmi(a,b) = ln( p(a,b) / (p(a) p(b)) )
                 = ln( ((c_ab * T1) * T1) / ((c_a * c_b) * T2) )

    with c over token/bigram instances, T1/T2 the unigram/bigram
    instance totals, arithmetic parenthesized exactly as written in
    DOUBLE on both engines (IEEE ops are bit-deterministic given the
    order; the 1-ulp ``ln`` gap is absorbed by round-6).
    ``min_count`` suppresses the unstable low-count tail (classic PMI
    bias toward hapax pairs). Returns (ngram, n_pair, pmi), ordered by
    (round-6 pmi desc, ngram) — a ``TakeOrdered``, never a full sort.

    Scale: one explode into unigram + bigram censuses (map-side
    combined, vocabulary-sized outputs), two joins of the surviving
    ``>= min_count`` pairs against the unigram table. The min_count
    filter runs BEFORE the joins, so the joined side is the collocation
    candidates, not the whole bigram census."""
    toks = docs.select(_tokens().alias("w"))
    uni = toks.select(F.explode("w").alias("tk"))
    uc = uni.groupBy("tk").agg(F.count(F.lit(1)).alias("c"))
    t1 = float(uni.count())
    grams = toks.select(F.explode(_gram_instances(F.col("w"), 2)).alias("ngram"))
    t2 = float(grams.count())
    pc = (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
        .withColumn("a", F.split("ngram", " ")[0])
        .withColumn("b", F.split("ngram", " ")[1])
    )
    ua = uc.select(F.col("tk").alias("a"), F.col("c").alias("ca"))
    ub = uc.select(F.col("tk").alias("b"), F.col("c").alias("cb"))
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") * F.lit(t1) * F.lit(t1))
            / (F.col("ca").cast("double") * F.col("cb").cast("double") * F.lit(t2))
        ),
        6,
    )
    return (
        pc.join(ua, "a")
        .join(ub, "b")
        .select("ngram", "n_pair", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("ngram"))
        .limit(k)
    )
