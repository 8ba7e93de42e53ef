"""Benchmark decontamination: n-gram overlap between a training
corpus and an evaluation set.

The standard LLM-training hygiene check (the GPT-3 appendix-C /
PaLM-style n-gram collision test): an eval document is contaminated
if its word n-grams appear in a training document. This module
reports, per (train_doc, eval_doc) pair, how many of the eval doc's
DISTINCT n-grams the train doc contains and the covered fraction —
the caller thresholds (e.g. frac >= 0.5 -> drop the train doc, or any
overlap at n=13 -> flag).

Shares the repo-wide whitespace-token / distinct-shingle spec
(``dedup.tokens_col`` / ``dedup.shingles_col``), so the n-gram
definition is identical to the near-dup operators and the DuckDB
oracle.

Scale shape: this is an inverted-index SEMI-join keyed on the n-gram
— never doc x doc. The eval side is a benchmark suite (thousands of
docs — microscopic next to the training corpus), so its exploded
n-gram table is broadcast; the train side streams map-side through
the broadcast hash join, and only matching (train, eval) n-gram hits
shuffle into the per-pair count. At 100 TB of training text the cost
is one scan + one aggregation of the (rare) hit set.
``max_train_df`` optionally drops n-grams appearing in more than
that many TRAIN docs (boilerplate guards the hit-set size; dropped
grams under-count those pairs — same honesty note as
``dedup.max_shingle_df``); eval-side cutoffs are pointless at these
cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles_col


def contamination_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_overlap: int = 1,
    max_train_df: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(train_id, eval_id, n_overlap, eval_ngrams, frac): per pair,
    the count of the eval doc's distinct n-grams found in the train
    doc, the eval doc's distinct n-gram total, and the covered
    fraction (double; callers round at the contract boundary). Pairs
    below ``min_overlap`` hits are dropped. Eval docs shorter than n
    tokens have no n-grams and never appear."""
    ev = eval_docs.select(
        F.col(id_col).alias("eval_id"), F.explode(shingles_col(n)).alias("sh")
    )
    ev_sizes = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("eval_ngrams"))
    tr = train.select(
        F.col(id_col).alias("train_id"), F.explode(shingles_col(n)).alias("sh")
    )
    if max_train_df is not None:
        freq = (
            tr.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("tdf"))
            .filter(F.col("tdf") <= max_train_df)
            .select("sh")
        )
        tr = tr.join(freq, "sh")
    hits = (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return hits.join(F.broadcast(ev_sizes), "eval_id").select(
        "train_id",
        "eval_id",
        "n_overlap",
        "eval_ngrams",
        (F.col("n_overlap") / F.col("eval_ngrams").cast("double")).alias("frac"),
    )
