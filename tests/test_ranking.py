"""BM25 / TF-IDF lexical ranking vs a pure-Python oracle sharing the
whitespace-token spec."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from pregel_spark.pipeline import (
    bm25_scores,
    bm25_topk,
    doc_lengths,
    term_index,
    tfidf_scores,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cat dog cat dog cat"),
    (4, "  "),                       # whitespace-only -> zero tokens
    (5, "quantum entanglement of the cat"),
    (6, "log log log log log log log log"),
]


def _toks(text):
    t = text.strip()
    return [] if not t else re.split(r"\s+", t)


def _py_bm25(corpus, k1=1.2, b=0.75, max_df_ratio=None):
    toks = {i: _toks(t) for i, t in corpus}
    n = float(len(corpus))
    avgdl = sum(len(w) for w in toks.values()) / n
    df = Counter()
    for w in toks.values():
        df.update(set(w))
    out = {}
    for i, w in toks.items():
        for term, tf in Counter(w).items():
            if max_df_ratio is not None and df[term] > max_df_ratio * n:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            score = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(w) / avgdl)
            )
            out[(term, i)] = (tf, df[term], len(w), score)
    return out


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_term_index_and_lengths(spark):
    idx = {(r.term, r.doc_id): r.tf for r in term_index(_docs(spark)).collect()}
    want = {}
    for i, t in CORPUS:
        for term, tf in Counter(_toks(t)).items():
            want[(term, i)] = tf
    assert idx == want
    dl = {r.doc_id: r.dl for r in doc_lengths(_docs(spark)).collect()}
    assert dl == {i: len(_toks(t)) for i, t in CORPUS}
    assert dl[4] == 0


def test_bm25_matches_python_oracle_exactly(spark):
    got = {
        (r.term, r.doc_id): (r.tf, r.df, r.dl, r.score)
        for r in bm25_scores(_docs(spark), max_df_ratio=None).collect()
    }
    want = _py_bm25(CORPUS)
    assert set(got) == set(want)
    for key, (tf, df, dl, score) in want.items():
        gtf, gdf, gdl, gscore = got[key]
        assert (gtf, gdf, gdl) == (tf, df, dl), key
        # same op order; ln() itself may differ by 1 ulp between
        # java.lang.Math and libm, so compare at 1e-12 relative —
        # contract rows round to 6 decimals, absorbing the ulp
        assert gscore == pytest.approx(score, rel=1e-12), key


def test_bm25_stopword_cutoff(spark):
    # ratio 0.4 over 6 docs -> keep df <= 2: 'the' (df 3) and 'cat'
    # (df 3) dropped, 'dog'/'log' (df 2) kept
    got = {r.term for r in bm25_scores(_docs(spark), max_df_ratio=0.4).collect()}
    assert "the" not in got and "cat" not in got
    assert "dog" in got and "log" in got
    want = {t for (t, _i) in _py_bm25(CORPUS, max_df_ratio=0.4)}
    assert got == want


def test_tfidf_matches_python_oracle(spark):
    got = {
        (r.term, r.doc_id): (r.tf, r.df, r.score)
        for r in tfidf_scores(_docs(spark), max_df_ratio=None).collect()
    }
    n = float(len(CORPUS))
    df = Counter()
    for _i, t in CORPUS:
        df.update(set(_toks(t)))
    for (term, i), (tf, dfv, score) in got.items():
        assert dfv == df[term]
        assert score == pytest.approx(
            tf * math.log(1.0 + n / df[term]), rel=1e-12
        ), (term, i)


def test_bm25_topk_deterministic_ranking(spark):
    rows = bm25_topk(_docs(spark), ["cat", "log", "zzz-missing"], k=2).collect()
    got = {(r.term, r.rnk): (r.doc_id, r.score) for r in rows}
    # per-term ranks are 1..k, dense, no missing-term rows
    assert all(t in ("cat", "log") for (t, _), _ in got.items())
    want = _py_bm25(CORPUS)
    for term in ("cat", "log"):
        ranked = sorted(
            ((i, s[3]) for (t, i), s in want.items() if t == term),
            key=lambda x: (-x[1], x[0]),
        )[:2]
        for pos, (doc, score) in enumerate(ranked, start=1):
            gdoc, gscore = got[(term, pos)]
            assert gdoc == doc and gscore == pytest.approx(score, rel=1e-12)


def test_bm25_topk_empty_terms(spark):
    assert bm25_topk(_docs(spark), [], k=3).collect() == []
