"""Multinomial Naive Bayes vs a pure-Python replay of the pinned spec
(pipeline/classify.py): add-1 smoothing over the training vocabulary,
round-6 scores before the argmax, smallest-label tie-break.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from pregel_spark.pipeline.classify import nb_score, nb_train


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def py_nb(train_rows, score_rows):
    cw, nd, nt, vocab = {}, Counter(), Counter(), set()
    for _, t, l in train_rows:
        nd[l] += 1
        for w in t.split():
            cw.setdefault(l, Counter())[w] += 1
            nt[l] += 1
            vocab.add(w)
    V, labels, total = len(vocab), sorted(nd), sum(nd.values())
    out = {}
    for d, t, _ in score_rows:
        best = None
        for lab in labels:
            s = math.log(nd[lab]) - math.log(total)
            for w in t.split():
                s += math.log(cw.get(lab, {}).get(w, 0) + 1.0) - math.log(nt[lab] + V)
            s = round(s, 6)
            if best is None or s > best[1]:
                best = (lab, s)
        out[d] = best
    return out


def rand_rows(seed, n=40):
    rng = random.Random(seed)
    langs = {
        "en": ["the", "cat", "dog", "house", "quick"],
        "fr": ["le", "chat", "chien", "maison", "vite"],
        "de": ["der", "katze", "hund", "haus", "schnell"],
    }
    rows = []
    for d in range(n):
        l = rng.choice(sorted(langs))
        # mostly in-language with some cross-language noise
        pool = langs[l] * 4 + [w for ws in langs.values() for w in ws]
        rows.append((d, " ".join(rng.choice(pool) for _ in range(rng.randint(0, 12))), l))
    return rows


def test_self_classification_matches_python(spark):
    for seed in (0, 1):
        rows = rand_rows(seed)
        m = nb_train(docs_df(spark, rows))
        got = {r.doc_id: (r.label, r.score) for r in nb_score(docs_df(spark, rows), m).collect()}
        assert got == py_nb(rows, rows), seed


def test_oov_terms_and_new_docs(spark):
    train = [(1, "the cat sat", "en"), (2, "le chat noir", "fr")]
    test = [(10, "the zebra xylophone", "x"), (11, "le zebra", "x"), (12, "", "x")]
    m = nb_train(docs_df(spark, train))
    got = {r.doc_id: (r.label, r.score) for r in nb_score(docs_df(spark, test), m).collect()}
    assert got == py_nb(train, test)
    # empty doc scores on priors alone; equal priors -> smallest label
    assert got[12][0] == "en"
    assert got[12][1] == round(math.log(0.5), 6)


def test_model_shapes(spark):
    rows = rand_rows(2)
    m = nb_train(docs_df(spark, rows))
    assert m.labels == sorted(m.n_docs)
    assert sum(m.n_docs.values()) == len(rows)
    lik = m.likelihood.collect()
    assert len(lik) == m.vocab_size
    # per-class counts in the pivoted table sum to the class token totals
    for i, l in enumerate(m.labels):
        assert sum(r[f"c_{i}"] for r in lik) == m.n_tokens[l]
