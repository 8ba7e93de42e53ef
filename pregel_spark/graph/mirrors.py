"""Mirror / link-farm candidate detection: outlink-set near-duplicates.

The classic mirror-detection signal (Bharat & Broder, WWW 1999): two
pages or hosts that serve near-identical OUTLINK SETS are mirror
candidates, and boilerplate link farms share duplicated link blocks.
No reference counterpart (a training-pipeline extra like dedup/ANN,
SURVEY §2.9) — but zero new kernel code: it composes the edge table
(S1 ingestion) with the MinHash+LSH dedup machinery
(``pipeline/dedup.py``).

Spark-first shape, sized for 100 TB:

- one ``groupBy(src).collect_set(dst)`` builds the "adjacency
  document" per source — the sorted distinct outlinks joined by
  spaces (bounded by max out-degree; ``max_out`` caps hub rows,
  ``min_out`` drops trivial 1-outlink pages whose pairs are
  meaningless and quadratic);
- EXACT-duplicate outlink sets collapse to one representative FIRST
  (hash-group on the canonical set string): true mirror farms are
  usually byte-identical, and collapsing avoids emitting C(n,2)
  identical pairs per farm — the same blowup-cutoff philosophy as
  ``dedup.ngram_jaccard_pairs``' posting-list cap. The farms
  themselves are reported by :func:`exact_mirror_groups`;
- MinHash+LSH with **1-token shingles** over the representatives: a
  token IS an outlink (URLs contain no whitespace), so the LSH verify
  step computes the EXACT Jaccard over outlink sets — no n-gram
  approximation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.dedup import minhash_lsh_pairs


def outlink_docs(
    edges: DataFrame, min_out: int = 2, max_out: int | None = None
) -> DataFrame:
    """(doc_id = src, text = sorted distinct outlinks joined by ' ').

    ``min_out`` drops sources with fewer distinct outlinks (a shared
    single outlink makes every such pair Jaccard 1 — quadratic,
    meaningless output); ``max_out`` optionally caps hub pages."""
    docs = (
        edges.select("src", "dst")
        .groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("outs"))
        .withColumn("n_out", F.size("outs"))
        .filter(F.col("n_out") >= min_out)
    )
    if max_out is not None:
        docs = docs.filter(F.col("n_out") <= max_out)
    return docs.select(
        F.col("src").alias("doc_id"), F.concat_ws(" ", "outs").alias("text")
    )


def exact_mirror_groups(
    edges: DataFrame, min_out: int = 2, max_out: int | None = None
) -> DataFrame:
    """Byte-identical outlink sets: (h, keep_id = min member, n) for
    groups with ≥2 members — the exact-mirror farms. One shuffle
    (hash-group on the canonical set string), map-side partial agg."""
    docs = outlink_docs(edges, min_out, max_out)
    return (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )


def mirror_pairs(
    edges: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    min_out: int = 2,
    max_out: int | None = None,
    collapse_exact: bool = True,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-identical (but not byte-identical) outlink-set pairs:
    (a, b, jaccard) with a < b, jaccard ≥ threshold computed EXACTLY
    over the distinct outlink sets. With ``collapse_exact`` (default)
    each byte-identical group is represented by its min member —
    recover the full farms via :func:`exact_mirror_groups`.

    ``hash_fn``: 'md5' (default — DuckDB/Postgres-reproducible bit-
    exactly, the oracle family) or 'xxhash64' (~2x cheaper signatures;
    same pairs modulo LSH sampling; the same trade as
    ``dedup.minhash_lsh_pairs``, quantified in BASELINE.md). One
    shingle per edge, so signature cost scales with |E| like
    ``dedup_minhash`` scales with corpus shingle volume."""
    from .engine import materialize

    docs = outlink_docs(edges, min_out, max_out)
    if collapse_exact:
        docs = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
            "doc_id", "text"
        )
    # checkpoint the adjacency documents: minhash_lsh_pairs references
    # its docs input ~3x (signatures + both verify sides) and here each
    # reference re-runs the collect_set groupBy (+ the exact-collapse
    # groupBy) over the full edge table — O(V) narrow rows, the same
    # table a 100 TB run would persist before an LSH sweep. (The
    # pipeline's own document corpus is NOT checkpointed there: a
    # parquet re-scan is cheaper than persisting wide shingle arrays —
    # measured +6s on dedup_minhash at sf0.1.)
    docs = materialize(docs)
    return minhash_lsh_pairs(
        docs,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        k=1,
        hash_fn=hash_fn,
    )
