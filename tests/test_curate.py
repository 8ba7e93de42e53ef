"""curate_corpus composition: pinned reason priority vs a pure-Python
recomputation of each rule over crafted documents."""

from __future__ import annotations

import pytest

from pregel_spark.pipeline import curate_corpus

GOOD = ("the cat and the dog sat in a field of green grass and it was good "
        "to see the sun in the sky over the hill and all was well with it")
DOCS = [
    (1, GOOD),                        # ok
    (2, GOOD),                        # exact dup of 1 -> exact_dup
    (3, GOOD + " extra tail words here today"),  # near-dup of 1 -> near_dup
    (4, "der hund und die katze ist ein tier und das ist gut so denn der "
        "hund und die katze und das tier sind da"),   # de -> lang
    (5, "the cat sat"),               # too_short (3 < 10)
    # all-'the' doc: lang=en and quality=1.0 pass, every 2-gram
    # identical -> repetitive
    (6, "the " * 60),
    # one en stopword (passes lang), 11 tokens (passes length), heavy
    # punctuation + thin stopword mass -> low_quality
    (7, "the z z z z z z z z z !!!!!!!!!!!!!!!!!!!!"),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r.doc_id: (r.keep, r.reason)
        for r in curate_corpus(
            spark, df,
            allowed_langs=("en",),
            min_tokens=10,
            min_quality=0.5,
            max_top2_frac=0.4,
            near_dup_threshold=0.1,
        ).collect()
    }


def test_reasons_and_priority(spark):
    got = _run(spark)
    assert got[1] == (True, "ok")
    assert got[2] == (False, "exact_dup")   # beats near_dup by priority
    assert got[3] == (False, "near_dup")
    assert got[4] == (False, "lang")
    assert got[5] == (False, "too_short")
    assert got[6] == (False, "repetitive")
    assert got[7] == (False, "low_quality")
    assert len(got) == len(DOCS)  # one verdict per document


def test_keep_iff_reason_ok(spark):
    got = _run(spark)
    for _i, (keep, reason) in got.items():
        assert keep == (reason == "ok")


def test_null_text_gets_verdict(spark):
    # regression: NULL text must not vanish from the verdict table —
    # it is treated as the empty document (zero tokens -> lang 'und',
    # which outranks too_short in the pinned order); two NULL docs are
    # exact duplicates of each other
    rows = [(1, GOOD), (2, None), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.keep, r.reason)
        for r in curate_corpus(spark, df, allowed_langs=("en",)).collect()
    }
    assert len(got) == 3
    assert got[1] == (True, "ok")
    assert got[2] == (False, "lang")
    assert got[3] == (False, "exact_dup")  # md5('') dup of doc 2
