"""Gopher-style repetition stats vs a pure-Python oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from pregel_spark.pipeline import repetition_stats

DOCS = [
    (1, "a b a b a b a b"),                      # degenerate 2-gram loop
    (2, "the quick brown fox jumps over fences"),  # no repetition
    (3, "x\ny\nx\nz\nx"),                        # duplicate lines
    (4, "one two"),                              # shorter than n=3
    (5, " "),                                    # zero tokens
    (6, "spam spam spam spam spam spam"),
]


def _py_stats(text, ns=(2, 3)):
    toks = text.strip().split() if text.strip() else []
    lines = text.split("\n")
    lcnt = Counter(lines)
    n_lines = len(lines)
    dup_line = sum(c for c in lcnt.values() if c >= 2)
    chars = sum(len(l) for l in lines)
    dupchars = sum(c * len(l) for l, c in lcnt.items() if c >= 2)
    out = {
        "n_tokens": len(toks),
        "n_lines": n_lines,
        "dup_line_frac": dup_line / n_lines,
        "dup_line_char_frac": (dupchars / chars) if chars > 0 else 0.0,
    }
    for n in ns:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            out[f"top{n}_frac"] = 0.0
            out[f"dup{n}_frac"] = 0.0
            continue
        g = Counter(grams)
        out[f"top{n}_frac"] = max(g.values()) / len(grams)
        out[f"dup{n}_frac"] = sum(c for c in g.values() if c >= 2) / len(grams)
    return out


def test_repetition_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in repetition_stats(df).collect()}
    assert set(got) == {i for i, _ in DOCS}
    for i, text in DOCS:
        want = _py_stats(text)
        g = got[i]
        for k, v in want.items():
            assert g[k] == pytest.approx(v, rel=1e-12), (i, k)


def test_repetition_flags_degenerate_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    # 'spam' x6: every 2-gram identical
    assert got[6].top2_frac == 1.0 and got[6].dup2_frac == 1.0
    # clean doc: no duplicate grams at all
    assert got[2].dup2_frac == 0.0 and got[2].dup3_frac == 0.0
    # duplicate lines: 3 of 5 line instances are 'x'
    assert got[3].dup_line_frac == pytest.approx(3 / 5)
    # too short for 3-grams -> 0.0 not null
    assert got[4].top3_frac == 0.0
    # whitespace-only doc: one empty line, no tokens
    assert got[5].n_tokens == 0 and got[5].top2_frac == 0.0


def test_repetition_custom_ns(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    cols = repetition_stats(df, ns=(4,)).columns
    assert "top4_frac" in cols and "dup4_frac" in cols and "top2_frac" not in cols


def test_unigram_logprob_matches_python(spark):
    import math
    from collections import Counter

    from pregel_spark.pipeline import unigram_logprob

    docs = [
        (1, "a a a b"),
        (2, "b c"),
        (3, "zzz"),      # rare token -> lowest score
        (4, "  "),       # no tokens -> 0.0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.mean_logprob) for r in unigram_logprob(df).collect()}

    toks = {i: t.split() for i, t in docs}
    cnt = Counter(w for ws in toks.values() for w in ws)
    n = sum(cnt.values())
    for i, ws in toks.items():
        want = sum(math.log(cnt[w] / n) for w in ws) / len(ws) if ws else 0.0
        ntok, mlp = got[i]
        assert ntok == len(ws)
        assert mlp == pytest.approx(want, rel=1e-12), i
    # rare-token doc scores lowest among non-empty docs
    assert got[3][1] == min(v for k, (_n, v) in got.items() if k != 4)


def test_pii_counts(spark):
    from pregel_spark.pipeline import pii_counts

    docs = [
        (1, "mail a.b+c@sub.example.org and d@e.io twice"),
        (2, "server at 192.168.0.1 and 10.0.255.3; call +4917012345678"),
        (3, "no pii here, just text. +123 too short, 1.2.3 not an ip"),
        (4, "+1234567 minimal phone; web@x.co"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.emails, r.ipv4s, r.intl_phones) for r in pii_counts(df).collect()}
    assert got[1] == (2, 0, 0)
    assert got[2] == (0, 2, 1)
    assert got[3] == (0, 0, 0)
    assert got[4] == (1, 0, 1)


def test_repetition_null_text_is_empty_doc(spark):
    from pregel_spark.pipeline import repetition_stats

    df = spark.createDataFrame([(1, None), (2, "a b a b")], "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_tokens == 0 and got[1].top2_frac == 0.0
