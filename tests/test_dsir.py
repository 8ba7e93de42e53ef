"""DSIR importance weights + Gumbel-top-k resampling and SemDeDup —
pure-Python oracles replaying the exact specs (portable md5 hashing,
add-1 smoothing, one-ln product ratio, round-6 contract)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from pregel_spark.pipeline import (
    importance_weights,
    resample_top_frac,
    semantic_dedup,
)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str, buckets: int, seed: int = 0) -> list[int]:
    w = text.strip().split() if text and text.strip() else []
    grams = list(w) + [f"{a} {b}" for a, b in zip(w, w[1:])]
    return [_hash60(f"{seed}:{g}") % buckets for g in grams]


def _py_weights(docs, target_ids, buckets, alpha=1.0):
    """(doc_id -> (n_feats, logratio)) replaying curation.importance_weights."""
    raw, tgt = {}, {}
    per_doc = {}
    for did, text in docs:
        bs = _feats(text, buckets)
        per_doc[did] = bs
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            if did in target_ids:
                tgt[b] = tgt.get(b, 0) + 1
    tr, tt = sum(raw.values()), sum(tgt.values())
    out = {}
    for did, bs in per_doc.items():
        s = 0.0
        for b in bs:
            s += math.log(
                ((tgt.get(b, 0) + alpha) * (float(tr) + alpha * buckets))
                / ((raw[b] + alpha) * (float(tt) + alpha * buckets))
            )
        out[did] = (len(bs), round(s, 6))
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lorem ipsum dolor sit amet consectetur"),
    (4, "zzz qqq xxx vvv kkk jjj"),
    (5, "the lazy dog sleeps all day the lazy dog"),
    (6, ""),
    (7, "quick brown foxes jump quickly"),
]
TARGET_IDS = {1, 2, 5}  # the fox/dog register is the "curated" style


@pytest.fixture(scope="module")
def weights(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = docs.filter(docs.doc_id.isin(*TARGET_IDS))
    return importance_weights(docs, target, buckets=256, ns=(1, 2), seed=0)


def test_weights_match_python_oracle(spark, weights):
    import pyspark.sql.functions as F

    got = {
        r["doc_id"]: (r["n_feats"], r["lr"])
        for r in weights.select(
            "doc_id", "n_feats", F.round("logratio", 6).alias("lr")
        ).collect()
    }
    want = _py_weights(DOCS, TARGET_IDS, buckets=256)
    assert got == want


def test_target_docs_score_higher(weights):
    rows = {r["doc_id"]: r["logratio"] for r in weights.collect()}
    # every in-target doc outranks every out-of-register doc
    assert min(rows[i] for i in (1, 2, 5)) > max(rows[i] for i in (3, 4))


def test_empty_doc_scores_zero(weights):
    row = weights.filter("doc_id = 6").collect()[0]
    assert row["n_feats"] == 0 and row["logratio"] == 0.0


def test_resample_deterministic_and_sized(spark, weights):
    a = resample_top_frac(weights, frac=0.5, seed=1)
    b = resample_top_frac(weights, frac=0.5, seed=1)
    ra = sorted(r["doc_id"] for r in a.collect())
    assert len(ra) == 3  # ceil-free int(7 * 0.5)
    assert ra == sorted(r["doc_id"] for r in b.collect())
    # zero temperature-ish: huge temperature makes it pure hash-gumbel,
    # tiny temperature makes it pure argmax on logratio
    top = resample_top_frac(weights, frac=0.2, temperature=1e-9, seed=1)
    (best,) = [r["doc_id"] for r in top.collect()]
    scores = {r["doc_id"]: r["logratio"] for r in weights.collect()}
    assert best == max(scores, key=lambda d: (scores[d], -d))


def test_resample_frac_validation(weights):
    with pytest.raises(ValueError):
        resample_top_frac(weights, frac=0.0)


# ----------------------------- SemDeDup ------------------------------


def test_semantic_dedup_within_cluster_only(spark):
    # two tight clusters far apart; near-identical pairs inside each;
    # one cross-cluster duplicate direction that must NOT be dropped
    # because the pair lands in different k-means cells
    vecs = {
        1: [1.0, 0.0],
        2: [1.0, 0.001],   # ~dup of 1, same cell -> dropped
        3: [0.0, 1.0],
        4: [0.001, 1.0],   # ~dup of 3, same cell -> dropped
        5: [-1.0, -1.0],   # far from everything, kept
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]]
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semantic_dedup(
            spark, df, threshold=0.95, centroids=cents
        ).collect()
    }
    assert out[1] == (0, True) and out[2] == (0, False)
    assert out[3] == (1, True) and out[4] == (1, False)
    assert out[5] == (2, True)


def test_semantic_dedup_matches_numpy(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 6)) * 4.0
    ids, X = [], []
    for i in range(90):
        base = centers[i % 3] + rng.normal(size=6) * 0.5
        ids.append(i)
        X.append(base)
        if i % 7 == 0:  # plant a near-duplicate with a larger id
            ids.append(1000 + i)
            X.append(base + rng.normal(size=6) * 1e-4)
    X = np.array(X)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semantic_dedup(spark, df, k=3, iters=2, threshold=0.999).collect()
    }
    # numpy replay: same kmeans recipe as test_kmeans, then the
    # greedy-by-id within-cluster cosine rule at round(.,6) >= thr
    from tests.test_kmeans import _np_kmeans

    a, _ = _np_kmeans(ids, X, k=3, iters=2)
    norms = np.linalg.norm(X, axis=1)
    cos = (X @ X.T) / np.outer(norms, norms)
    keep = {}
    for i, di in enumerate(ids):
        drop = any(
            a[j] == a[i]
            and ids[j] < di
            and round(cos[i, j], 6) >= 0.999
            for j in range(len(ids))
        )
        keep[di] = (int(a[i]), not drop)
    assert got == keep
    assert sum(1 for _, k in got.values() if not k) >= 10
