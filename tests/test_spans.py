"""Exact duplicate-span (substring) dedup — pure-Python oracle parity.

The oracle replays the pinned spec (pipeline/spans.py): whitespace
tokens, corpus-wide k-gram instance counts (same-doc repeats included),
overlap-or-touch island merge, all copies stripped.
"""

from __future__ import annotations

import random
from collections import Counter

from pregel_spark.pipeline.spans import (
    duplicate_spans,
    kgram_occurrences,
    strip_duplicate_spans,
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def py_spans(texts, k, min_count=2):
    toks = {d: (t.split() if t.strip() else []) for d, t in texts}
    census = Counter()
    occ = {d: [] for d, _ in texts}
    for d, w in toks.items():
        for i in range(len(w) - k + 1):
            g = " ".join(w[i : i + k])
            census[g] += 1
            occ[d].append((i + 1, g))
    spans = {}
    for d, w in toks.items():
        merged = []
        for s, g in occ[d]:
            if census[g] < min_count:
                continue
            e = s + k - 1
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        if merged:
            spans[d] = [tuple(m) for m in merged]
    return toks, spans


def py_strip(texts, k, min_count=2):
    toks, spans = py_spans(texts, k, min_count)
    out = {}
    for d, w in toks.items():
        drop = set()
        for s, e in spans.get(d, []):
            drop.update(range(s, e + 1))
        kept = [t for i, t in enumerate(w, 1) if i not in drop]
        out[d] = (" ".join(kept), len(kept), len(w) - len(kept))
    return out


def rand_corpus(seed, n_docs=30, vocab=12, lo=0, hi=40):
    """Tiny vocabulary forces genuine duplicated runs."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    return [
        (d, " ".join(rng.choice(words) for _ in range(rng.randint(lo, hi))))
        for d in range(n_docs)
    ]


def spark_spans(spark, texts, k, min_count=2, fingerprint="hash60"):
    df = duplicate_spans(
        docs_df(spark, texts), k=k, min_count=min_count, fingerprint=fingerprint
    )
    out = {}
    for r in df.collect():
        out.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        assert r.n_tokens == r.span_end - r.span_start + 1
    return {d: sorted(v) for d, v in out.items()}


def test_fixture_shared_and_self_repeat(spark):
    texts = [
        (1, "a b c d e f g h i j unique1 k l m"),
        (2, "x y a b c d e f g h i j z w"),
        (3, "short doc"),
        (4, "rep rep rep rep rep rep rep rep rep rep"),
        (5, ""),
    ]
    got = spark_spans(spark, texts, k=8)
    assert got == {1: [(1, 10)], 2: [(3, 12)], 4: [(1, 10)]}
    stripped = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_dropped)
        for r in strip_duplicate_spans(docs_df(spark, texts), k=8).collect()
    }
    assert stripped == py_strip(texts, 8)
    assert stripped[2] == ("x y z w", 4, 10)
    assert stripped[5] == ("", 0, 0)


def test_random_corpus_matches_python_oracle(spark):
    for seed, k, mc in [(0, 3, 2), (1, 4, 2), (2, 3, 3)]:
        texts = rand_corpus(seed)
        _, want = py_spans(texts, k, mc)
        got = spark_spans(spark, texts, k=k, min_count=mc)
        assert got == {d: sorted(v) for d, v in want.items()}, (seed, k, mc)
        want_strip = py_strip(texts, k, mc)
        got_strip = {
            r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_dropped)
            for r in strip_duplicate_spans(
                docs_df(spark, texts), k=k, min_count=mc
            ).collect()
        }
        assert got_strip == want_strip, (seed, k, mc)


def test_exact_fingerprint_agrees_with_hash60(spark):
    texts = rand_corpus(7, n_docs=20, vocab=8)
    assert spark_spans(spark, texts, k=3, fingerprint="exact") == spark_spans(
        spark, texts, k=3, fingerprint="hash60"
    )


def test_touching_islands_merge(spark):
    # two duplicated 2-grams "a b" (pos 1) and "c d" (pos 3) touch
    # (ends at 2, starts at 3) -> one span [1, 4]
    texts = [(1, "a b c d"), (2, "a b x c d")]
    got = spark_spans(spark, texts, k=2)
    assert got[1] == [(1, 4)]
    assert got[2] == [(1, 2), (4, 5)]


def test_short_docs_emit_nothing(spark):
    texts = [(1, "a b"), (2, "a b"), (3, "   ")]
    occ = kgram_occurrences(docs_df(spark, texts), k=3).collect()
    assert occ == []
    assert spark_spans(spark, texts, k=3) == {}


def test_partition_layout_invariance(spark):
    texts = rand_corpus(11)
    base = docs_df(spark, texts)
    variants = [base.coalesce(1), base.repartition(7, "doc_id")]
    want = spark_spans(spark, texts, k=3)
    for v in variants:
        got = {}
        for r in duplicate_spans(v, k=3).collect():
            got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        assert {d: sorted(x) for d, x in got.items()} == want
