"""Distributed multinomial Naive Bayes — train + score as censuses.

The workhorse lightweight classifier of web-corpus pipelines (language
ID, quality buckets, topic routing — the fastText niche): training is
nothing but per-class token censuses, so at 100 TB it is ONE map-side-
combined groupBy producing a vocabulary×classes table; there is no
iterative optimization and no Python in any row path.

Pinned spec (engine-portable):
- Words = the repo-wide whitespace tokenizer (``dedup.tokens_col``);
  multinomial event model over word instances.
- Add-1 (Laplace) smoothing over the TRAINING vocabulary V:
  log p(w|l) = ln(c_wl + 1) - ln(N_l + V). Out-of-vocabulary words at
  scoring time use c_wl = 0 — they still discriminate via the class
  denominators.
- Class prior = ln(docs_l) - ln(docs_total).
- Score arithmetic: per-(doc, term) instance counts multiply the
  per-term log-likelihood (one join on ``term``), summed per doc; the
  class scalars (ln(N_l + V), prior) enter once per doc as literals.
  Scores are rounded to 6 decimals BEFORE the argmax so the 1-ulp
  ln()/summation-order differences between engines cannot flip the
  winner; ties on the rounded score break to the lexicographically
  smallest label. (Same determinism contract as BM25/TF-IDF.)

Scale design: train = one explode + one groupBy((term, label)) — the
model is vocabulary-sized, never corpus-sized. Score = one explode +
one (doc, term) count groupBy + ONE hash join against the pivoted
vocabulary table + one per-doc agg. The pivot's class columns are
bounded by the label count (a handful), collected once on the driver.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col


@dataclass
class NBModel:
    labels: list[str]  # sorted
    n_docs: dict[str, int]  # label -> training docs
    n_tokens: dict[str, int]  # label -> token instances
    vocab_size: int
    likelihood: DataFrame  # (term, <one count column per label>)


def nb_train(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> NBModel:
    """Fit the censuses. Driver round-trips collect only class-level
    scalars (#labels rows) — the vocabulary table stays distributed."""
    inst = docs.select(
        F.col(label_col).alias("label"), F.explode(tokens_col(text_col)).alias("term")
    )
    stats = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(
            inst.groupBy("label").agg(F.count(F.lit(1)).alias("n_tokens")),
            "label",
            "left",
        )
        .collect()
    )
    labels = sorted(r["label"] for r in stats)
    n_docs = {r["label"]: int(r["n_docs"]) for r in stats}
    n_tokens = {r["label"]: int(r["n_tokens"] or 0) for r in stats}
    counts = inst.groupBy("term", "label").agg(F.count(F.lit(1)).alias("cnt"))
    lik = (
        counts.groupBy("term")
        .pivot("label", labels)
        .sum("cnt")
        .select(
            "term",
            *[F.coalesce(F.col(f"`{l}`"), F.lit(0)).alias(f"c_{i}") for i, l in enumerate(labels)],
        )
    )
    vocab_size = counts.select("term").distinct().count()
    return NBModel(labels, n_docs, n_tokens, vocab_size, likelihood=lik)


def nb_score(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, label, score) — the argmax class per document with its
    rounded joint log-probability. Zero-token docs score on priors
    alone (the lexicographically-first among max-prior labels)."""
    total_docs = sum(model.n_docs.values())
    denom = {
        l: math.log(model.n_tokens[l] + model.vocab_size) for l in model.labels
    }
    prior = {
        l: math.log(model.n_docs[l]) - math.log(total_docs) for l in model.labels
    }
    dt = (
        docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    joined = dt.join(model.likelihood, "term", "left")
    per_doc = joined.groupBy(id_col).agg(
        *[
            F.sum(
                F.col("k")
                * (
                    F.log(F.coalesce(F.col(f"c_{i}"), F.lit(0)) + F.lit(1.0))
                    - F.lit(denom[l])
                )
            ).alias(f"s_{i}")
            for i, l in enumerate(model.labels)
        ]
    )
    scored = docs.select(id_col).join(per_doc, id_col, "left")
    # argmax over (rounded score, label-rank) structs; rank is the
    # label's position in the REVERSE-sorted list so that on rounded
    # ties the larger struct corresponds to the SMALLER label.
    packed = F.array_max(
        F.array(
            *[
                F.struct(
                    F.round(
                        F.coalesce(F.col(f"s_{i}"), F.lit(0.0)) + F.lit(prior[l]), 6
                    ).alias("score"),
                    F.lit(len(model.labels) - 1 - i).alias("rk"),
                )
                for i, l in enumerate(model.labels)
            ]
        )
    )
    rev = list(reversed(model.labels))
    return scored.withColumn("_m", packed).select(
        id_col,
        F.element_at(
            F.array(*[F.lit(l) for l in rev]), (F.col("_m.rk") + 1).cast("int")
        ).alias("label"),
        F.col("_m.score").alias("score"),
    )
