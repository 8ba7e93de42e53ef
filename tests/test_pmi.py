"""PMI collocations — exact pure-Python oracle."""

from __future__ import annotations

import math
from collections import Counter

from pregel_spark.pipeline import pmi_ngrams

DOCS = [
    (1, "hong kong is far from new york but hong kong is dense"),
    (2, "new york and hong kong share the skyline the skyline"),
    (3, "the city the city the city is the city"),
    (4, "kong hong is not hong kong"),
    (5, ""),
    (6, "the end of the day and the rest of the story"),
]


def _py_pmi(docs, min_count, k):
    uni, pair = Counter(), Counter()
    for _, text in docs:
        w = text.split()
        uni.update(w)
        pair.update(zip(w, w[1:]))
    t1, t2 = sum(uni.values()), sum(pair.values())
    rows = []
    for (a, b), c in pair.items():
        if c >= min_count:
            pmi = round(
                math.log(((c * float(t1)) * t1) / ((uni[a] * float(uni[b])) * t2)),
                6,
            )
            rows.append((f"{a} {b}", c, pmi))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:k]


def test_pmi_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["ngram"], r["n_pair"], r["pmi"])
        for r in pmi_ngrams(df, min_count=2, k=10).collect()
    ]
    want = _py_pmi(DOCS, min_count=2, k=10)
    assert got == want
    # the collocation beats the merely-frequent pair
    ranks = {g: i for i, (g, _, _) in enumerate(got)}
    assert ranks["hong kong"] < ranks["the city"]


def test_pmi_min_count_bounds_output(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert pmi_ngrams(df, min_count=100, k=10).count() == 0
