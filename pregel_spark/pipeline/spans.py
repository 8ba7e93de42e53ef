"""Exact duplicate-span (substring) dedup — Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better" (ExactSubstr).

Document- and line-level dedup miss the common web case where two
otherwise-distinct pages share a long verbatim passage (quoted article,
license block, templated paragraph). ExactSubstr removes EVERY
occurrence of any token span that appears more than once in the corpus
— including a second copy inside the same document. The reference
engine's tuple pipeline exposes the same scan→group→join building
blocks (`pregel/avro/frontend.lua` record streams); here the whole
operator is three declarative exchanges.

Spec (pinned for engine portability):
- Token stream = the repo-wide whitespace tokenizer
  (``dedup.tokens_col``); positions are 1-based.
- A k-gram starting at position ``s`` covers tokens ``[s, s+k-1]``.
  A k-gram is *duplicated* when its corpus-wide occurrence count
  (instance count — same-doc repeats included, exactly like Lee et
  al.'s suffix-array counts) reaches ``min_count`` (default 2).
- Duplicated-gram cover intervals that overlap OR touch
  (``next_start <= prev_end + 1``) merge into one maximal span: for
  *stripping* the two cases are indistinguishable (both token runs go
  away), so reporting them as one span keeps the output canonical.
- ``strip_duplicate_spans`` drops ALL copies (Lee et al. §4.1: the
  tool removes every occurrence; dropping all-but-one would make the
  survivor's identity partition-order-dependent). Stripping can
  create NEW adjacencies that form previously-unseen k-grams; like
  the original, this operator does not iterate to a fixpoint.

Scale design (linear, 100 TB-shaped):
- occurrences: one scan, ``explode`` of per-doc gram arrays — O(total
  tokens) rows, no shuffle.
- census: ONE ``groupBy(gram)`` whose map-side partial agg collapses
  hot boilerplate grams early (a gram repeated 10M times leaves each
  map task as one row), then a left-semi join back on the gram key —
  per-occurrence rows join a single flag row, so hot grams skew the
  *census* (partial-agg-absorbed), never the join.
- spans: one doc-keyed exchange shared by the island window and the
  rebuild groupBy.
- ``fingerprint='hash60'`` (default) shuffles an 8-byte key instead of
  the gram text — the engine-portable md5-60 family
  (``hashing.hash60``), so external oracles reproduce it bit-exactly;
  ``'exact'`` groups on the raw gram string (zero collision risk; at
  10^12 grams the 60-bit family expects ~1 collision corpus-wide).

Reference parity: the reference has no substring dedup; this extends
its dedup surface the way a Common-Crawl curation pipeline needs
(round brief: dedup is a first-class component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import tokens_col
from .hashing import hash60


def kgram_occurrences(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: str = "hash60",
) -> DataFrame:
    """(id, start, gram_key) — every token k-gram occurrence.

    ``start`` is the 1-based position of the gram's first token;
    ``gram_key`` is the portable 60-bit hash of the space-joined gram
    (``fingerprint='exact'``: the gram string itself). Docs shorter
    than ``k`` tokens emit nothing.
    """
    if fingerprint not in ("hash60", "exact"):
        raise ValueError(f"fingerprint must be hash60|exact, got {fingerprint!r}")
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - k + 1),
        lambda i: F.struct(
            i.cast("int").alias("start"),
            F.concat_ws(" ", F.slice(toks, i, k)).alias("gram"),
        ),
    )
    occ = (
        docs.where(F.size(toks) >= k)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.start").alias("start"), F.col("g.gram").alias("gram"))
    )
    key = hash60("gram") if fingerprint == "hash60" else F.col("gram")
    return occ.select(id_col, "start", key.alias("gram_key"))


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: str = "hash60",
) -> DataFrame:
    """(id, span_start, span_end, n_tokens) — maximal duplicated spans.

    ``span_start``/``span_end`` are 1-based inclusive token positions;
    overlapping/touching duplicated k-gram covers are merged per doc
    (gaps-and-islands over a running-max window).
    """
    occ = kgram_occurrences(docs, k, id_col, text_col, fingerprint)
    dup = (
        occ.groupBy("gram_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("gram_key")
    )
    hits = occ.join(dup, "gram_key", "left_semi").select(
        id_col, "start", (F.col("start") + (k - 1)).alias("end")
    )
    w = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = hits.withColumn(
        "_new",
        F.when(prev_end.isNull() | (F.col("start") > prev_end + 1), 1).otherwise(0),
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        flagged.groupBy(id_col, "_island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: str = "hash60",
) -> DataFrame:
    """(id, text, n_tokens_kept, n_tokens_dropped) — every duplicated
    span removed from every document (all copies; see module spec).

    One hash join of the per-doc span arrays onto the corpus, then a
    pure scan: tokens are filtered by position against the doc's spans
    inside a single higher-order ``filter`` (JVM codegen, no Python,
    no second explode of the token stream).
    """
    spans = (
        duplicate_spans(docs, k, min_count, id_col, text_col, fingerprint)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("_spans"))
    )
    toks = tokens_col(text_col)
    joined = docs.join(spans, id_col, "left").withColumn(
        "_spans", F.coalesce("_spans", F.array().cast("array<struct<span_start:int,span_end:int>>"))
    )
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("_spans"),
            lambda sp: ((i + 1) >= sp["span_start"]) & ((i + 1) <= sp["span_end"]),
        ),
    )
    return joined.select(
        id_col,
        F.concat_ws(" ", kept).alias(text_col),
        F.size(kept).alias("n_tokens_kept"),
        (F.size(toks) - F.size(kept)).alias("n_tokens_dropped"),
    )
