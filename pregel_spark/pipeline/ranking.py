"""Lexical retrieval scoring over a document table: inverted term
index, TF-IDF, and BM25 (Robertson/Sparck-Jones Okapi BM25 — the
default first-stage ranker of every web search stack and the standard
lexical baseline next to embedding retrieval).

The reference engine ships no text-ranking surface (its scope is the
BSP graph loops); this module is part of the §2.9 webtext extension,
sharing the whitespace-token spec with ``textstats``/``dedup``
(``dedup.tokens_col``) so every text operator in the repo tokenizes
identically.

Engine-portability: every score is computed from integer-exact
sufficient statistics (tf, df, dl, N) with an explicit IEEE-double
op order documented per function. The one non-portable op is ``ln``
itself (java.lang.Math vs libm differ by up to 1 ulp — measured:
ln(3.0) disagrees in the last bit), so scores are
identical-to-1-ulp-per-ln, and contract rows round at 6 decimals,
which absorbs it (same policy as ``structure.adamic_adar``). Tokens are NOT
case-folded or stemmed here: normalization is the caller's choice
(``lower(text)`` upstream), keeping the index spec byte-exact.

Scale: the index is one explode + one (term, doc) partial-agg
shuffle — the canonical map-side-combine shape; df is one more O(index)
agg keyed by term alone. Scoring joins the postings to df on ``term``
(a shuffle join at web scale; vocabulary skew is bounded because
stopword postings ARE the skew and ``max_df_ratio`` drops them — the
same posting-list cutoff as ``dedup.max_shingle_df``). The corpus
scalars (N, avgdl) ride a 1-row broadcast cross join, never a driver
collect inside the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import tokens_col


def term_index(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Inverted postings: (term, doc_id, tf) — term frequency per
    document under the shared whitespace-token spec. One explode +
    one partial-agg shuffle keyed (term, doc_id)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens_col().alias("w"))
        .select("doc_id", F.explode("w").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) — token count per document (same spec)."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens_col()).alias("dl")
    )


def _bm25_score(k1: float, b: float):
    """The one shared BM25 scoring expression (exact op order — both
    bm25_scores and bm25_topk must produce bit-identical doubles)."""
    tf = F.col("tf").cast("double")
    dfd = F.col("df").cast("double")
    dl = F.col("dl").cast("double")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    )
    return idf * (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.col("avgdl"))
    )


def bm25_scores(
    docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float | None = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full BM25 score table (term, doc_id, tf, df, dl, score):

        idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
        score = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    with N = corpus size, dl = doc token count, avgdl = mean dl (all
    cast to double exactly once, in that op order — the oracle mirrors
    it). The +1 inside the ln is the Lucene non-negative variant.

    ``max_df_ratio`` drops terms appearing in more than that fraction
    of documents (df > ratio·N): stopwords carry ~zero idf yet own the
    longest postings, so the cutoff bounds both join skew and output
    size — at web scale this is what keeps the score table ~linear in
    corpus tokens. Pass None to keep everything.
    """
    idx = term_index(docs, id_col)
    lens = doc_lengths(docs, id_col)
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    df_tab = idx.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        idx.join(df_tab, "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    if max_df_ratio is not None:
        scored = scored.filter(
            F.col("df").cast("double") <= F.lit(float(max_df_ratio)) * F.col("n_docs")
        )
    return scored.select(
        "term", "doc_id", "tf", "df", "dl", _bm25_score(k1, b).alias("score")
    )


def tfidf_scores(
    docs: DataFrame,
    max_df_ratio: float | None = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Classic smoothed TF-IDF (term, doc_id, tf, df, score):
    ``score = tf * ln(1 + N / df)`` — same integer statistics, same
    cutoff semantics as :func:`bm25_scores`, no length normalization.
    """
    idx = term_index(docs, id_col)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    df_tab = idx.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = idx.join(df_tab, "term").crossJoin(F.broadcast(n_docs))
    if max_df_ratio is not None:
        scored = scored.filter(
            F.col("df").cast("double") <= F.lit(float(max_df_ratio)) * F.col("n_docs")
        )
    score = F.col("tf").cast("double") * F.log(
        F.lit(1.0) + F.col("n_docs") / F.col("df").cast("double")
    )
    return scored.select("term", "doc_id", "tf", "df", score.alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: DataFrame | list[str],
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per query term by BM25, deterministic:
    (term, doc_id, score, rnk) ranked by (score DESC, doc_id ASC).
    ``terms`` is a 1-column DataFrame or a literal list (possibly
    empty); it is broadcast — the query set is always tiny next to
    the postings. The broadcast filter lands on the postings BEFORE
    the df/length/scoring joins, so a 3-term query over a web-scale
    corpus scores 3 posting lists, not the vocabulary — while df, N
    and avgdl stay CORPUS-global (identical scores to
    :func:`bm25_scores`, which shares the scoring expression). The
    per-term top-k window partitions by term, so the sort is
    per-posting-list, never global."""
    spark = docs.sparkSession
    if isinstance(terms, list):
        terms = spark.createDataFrame([(t,) for t in terms], "term string")
    qterms = F.broadcast(terms.select("term").distinct())
    idx = term_index(docs, id_col).join(qterms, "term")
    lens = doc_lengths(docs, id_col)
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    # df must stay corpus-global: recount from the full postings, then
    # prune to the query terms (vocabulary-sized until the semi-join)
    df_tab = (
        term_index(docs, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(qterms, "term")
    )
    scored = (
        idx.join(df_tab, "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", _bm25_score(k1, b).alias("score"))
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("term", "doc_id", "score", "rnk")
    )
