"""Decontamination n-gram overlap vs a pure-Python oracle."""

from __future__ import annotations

import pytest

from pregel_spark.pipeline import contamination_overlap


def _shingles(text, n):
    toks = text.strip().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_overlap(train, ev, n, min_overlap=1, max_train_df=None):
    tr_sh = {i: _shingles(t, n) for i, t in train}
    ev_sh = {i: _shingles(t, n) for i, t in ev}
    if max_train_df is not None:
        from collections import Counter

        df = Counter()
        for shs in tr_sh.values():
            df.update(shs)
        tr_sh = {i: {s for s in shs if df[s] <= max_train_df} for i, shs in tr_sh.items()}
    out = {}
    for ti, ts in tr_sh.items():
        for ei, es in ev_sh.items():
            k = len(ts & es)
            if k >= min_overlap and es:
                out[(ti, ei)] = (k, len(es), k / len(es))
    return out


TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox naps here while the lazy dog jumps"),
    (4, "short doc"),
    (5, "boiler plate text boiler plate text boiler plate text"),
    (6, "boiler plate text again and again boiler plate text"),
]
EVAL = [
    (100, "the quick brown fox jumps over a fence"),
    (101, "five dozen liquor jugs in my box"),
    (102, "zz yy xx"),
    (103, "tiny"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_matches_python_oracle(spark):
    got = {
        (r.train_id, r.eval_id): (r.n_overlap, r.eval_ngrams, r.frac)
        for r in contamination_overlap(
            _df(spark, TRAIN), _df(spark, EVAL), n=3
        ).collect()
    }
    want = _py_overlap(TRAIN, EVAL, 3)
    assert set(got) == set(want)
    for k, (c, tot, frac) in want.items():
        gc, gtot, gfrac = got[k]
        assert (gc, gtot) == (c, tot), k
        assert gfrac == pytest.approx(frac, rel=1e-12)
    # doc 1 shares 'the quick brown'+'quick brown fox' with eval 100
    assert got[(1, 100)][0] >= 2
    # eval docs shorter than n never appear
    assert not any(e in (102, 103) for (_t, e) in got)


def test_min_overlap_threshold(spark):
    got = {
        (r.train_id, r.eval_id)
        for r in contamination_overlap(
            _df(spark, TRAIN), _df(spark, EVAL), n=3, min_overlap=2
        ).collect()
    }
    want = set(_py_overlap(TRAIN, EVAL, 3, min_overlap=2))
    assert got == want and got  # non-empty


def test_max_train_df_drops_boilerplate(spark):
    # 'boiler plate text' appears in train docs 5 and 6 -> df 2;
    # eval carrying only that gram loses its hits at max_train_df=1
    ev = [(200, "boiler plate text")]
    full = contamination_overlap(_df(spark, TRAIN), _df(spark, ev), n=3).collect()
    assert {r.train_id for r in full} == {5, 6}
    cut = contamination_overlap(
        _df(spark, TRAIN), _df(spark, ev), n=3, max_train_df=1
    ).collect()
    assert cut == []
    want = _py_overlap(TRAIN, ev, 3, max_train_df=1)
    assert want == {}


def test_frac_full_containment(spark):
    ev = [(300, "pack my box with five dozen liquor jugs")]
    got = contamination_overlap(_df(spark, TRAIN), _df(spark, ev), n=5).collect()
    row = [r for r in got if r.train_id == 2][0]
    assert row.n_overlap == row.eval_ngrams and row.frac == 1.0
