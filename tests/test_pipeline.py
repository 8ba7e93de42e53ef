"""Pipeline operator correctness vs naive pure-Python oracles."""

from __future__ import annotations

import hashlib
from collections import Counter
from itertools import combinations

import numpy as np
import pytest

from pregel_spark.pipeline import (
    brute_force_topk,
    exact_dedup,
    ivf_topk,
    media_features,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_score,
    simhash_fingerprints,
    simhash_pairs,
    token_stats,
)
from pregel_spark.pipeline.multimodal import FEATURE_DIM, _fake_decode, make_fake_media

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat sat on the mat", "en"),          # exact dup of 0
    (2, "the cat sat on the big mat", "en"),      # near dup of 0
    (3, "completely different words entirely here now", "en"),
    (4, "der hund lief durch den park heute", "de"),
    (5, "the cat sat on the mat today", "en"),    # near dup of 0
    (6, "", "en"),
    (7, "one two", "en"),                          # shorter than shingle k
    (8, "completely different words entirely here today", "en"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, t, l) for i, t, l in DOCS], "doc_id long, text string, lang string"
    )


def _shingles(text, k=3):
    toks = text.split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _jaccard(a, b):
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def test_exact_dedup(docs):
    got = {r["h"]: (r["keep_id"], r["n"]) for r in exact_dedup(docs).collect()}
    want = {}
    groups = {}
    for i, t, _ in DOCS:
        groups.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(i)
    for h, ids in groups.items():
        want[h] = (min(ids), len(ids))
    assert got == want


def test_ngram_jaccard_pairs(docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, threshold=0.3, k=3).collect()}
    want = {}
    sh = {i: _shingles(t) for i, t, _ in DOCS}
    for a, b in combinations(sorted(sh), 2):
        if not sh[a] or not sh[b]:
            continue
        j = _jaccard(sh[a], sh[b])
        if j >= 0.3:
            want[(a, b)] = round(j, 6)
    assert got.keys() == want.keys()
    for p in want:
        assert np.isclose(got[p], want[p], atol=1e-6)


def test_minhash_lsh_finds_dups_and_verifies_exactly(docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           minhash_lsh_pairs(docs, threshold=0.3).collect()}
    sh = {i: _shingles(t) for i, t, _ in DOCS}
    # exact dup must be found (identical signatures land in every band)
    assert (0, 1) in got and np.isclose(got[(0, 1)], 1.0)
    # every reported jaccard must equal the true jaccard (verification)
    for (a, b), j in got.items():
        assert np.isclose(j, round(_jaccard(sh[a], sh[b]), 6), atol=1e-6)
    # LSH candidates are a subset of all >=threshold pairs (approx),
    # but exact dups are guaranteed
    assert all(j >= 0.3 for j in got.values())


def test_simhash(docs):
    fps = {r["id"]: r["fp"] for r in simhash_fingerprints(docs).collect()}

    def oracle_fp(text):
        # the portable md5-quarter token hash (dedup.simhash_fingerprints)
        toks = text.split()
        if not toks:
            return 0
        votes = [0] * 64
        for t in toks:
            d = hashlib.md5(t.encode("utf-8")).hexdigest()
            h = int(d[0:8], 16) | (int(d[8:16], 16) << 32)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        fp = 0
        for b in range(64):
            if votes[b] > 0:
                fp |= 1 << b
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    for i, t, _ in DOCS:
        assert fps[i] == oracle_fp(t), i
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0  # identical docs
    for (a, b), h in pairs.items():
        want = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
        assert h == want


def test_simhash_hamming_zero(docs):
    # max_hamming=0 => one 64-bit band; its all-ones mask must not
    # overflow a long (regression: (1<<64)-1 NumberFormatException)
    pairs = {(r["a"], r["b"]) for r in
             simhash_pairs(docs, max_hamming=0).collect()}
    assert (0, 1) in pairs  # identical docs collide exactly


def test_simhash_unicode(spark):
    # md5-of-string hashes UTF-8 bytes on every engine — non-ASCII
    # tokens fingerprint identically (the old FNV oracle was ASCII-only)
    rows = [(0, "héllo wörld ünïcode — über naïve"), (1, "日本語 テキスト 処理")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["id"]: r["fp"] for r in simhash_fingerprints(df).collect()}

    def oracle_fp(text):
        votes = [0] * 64
        for t in text.split():
            d = hashlib.md5(t.encode("utf-8")).hexdigest()
            h = int(d[0:8], 16) | (int(d[8:16], 16) << 32)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        fp = sum(1 << b for b in range(64) if votes[b] > 0)
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    for i, t in rows:
        assert fps[i] == oracle_fp(t), i


def _cosine(u, v):
    u, v = np.asarray(u, float), np.asarray(v, float)
    return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))


def test_brute_force_topk(spark):
    rng = np.random.default_rng(42)
    X = rng.normal(size=(50, 8))
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter("vec_id < 3")
    got = brute_force_topk(emb, queries, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["score"]))
    for q in range(3):
        sims = sorted(
            ((round(_cosine(X[q], X[j]), 6), j) for j in range(50) if j != q),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        want = [(rk + 1, j, s) for rk, (s, j) in enumerate(sims)]
        gotq = sorted(by_q[q])
        assert [(a, b) for a, b, _ in gotq] == [(a, b) for a, b, _ in want]
        for (_, _, gs), (_, _, ws) in zip(gotq, want):
            assert np.isclose(gs, ws, atol=1e-6)


def test_ivf_topk_recall(spark):
    rng = np.random.default_rng(1)
    # clustered data -> IVF recall should be high
    centers = rng.normal(scale=5.0, size=(4, 8))
    X = np.vstack([centers[i % 4] + rng.normal(size=8) for i in range(200)])
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter("vec_id < 5")
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.8, recalls


def test_ivf_index_prunes_partitions(spark, tmp_path):
    """write_ivf_index + ivf_topk_indexed: the scan must touch ONLY the
    probed centroid=... bucket directories (real partition pruning, not
    a post-scan filter), and results must equal inline ivf_topk with
    the same centroids."""
    from pyspark.sql import functions as F
    from pregel_spark.pipeline import ivf_topk, ivf_topk_indexed, write_ivf_index
    from pregel_spark.pipeline.simsearch import _probe_sets

    rng = np.random.default_rng(3)
    centers = rng.normal(scale=5.0, size=(8, 8))
    X = np.vstack([centers[i % 8] + rng.normal(size=8) for i in range(400)])
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    cents = write_ivf_index(emb, path, n_centroids=8)
    queries = emb.filter("vec_id < 3")

    probed = sorted(
        {c for _, cs in _probe_sets(queries, cents, 2, "vec_id", "embedding")
         for c in cs}
    )
    assert len(probed) < 8  # pruning must have something to prune

    # files actually read by the pruned scan all belong to probed buckets
    pruned_scan = spark.read.parquet(f"{path}/corpus").filter(
        F.col("centroid").isin(probed)
    )
    files = {
        r[0] for r in
        pruned_scan.select(F.input_file_name()).distinct().collect()
    }
    assert files and all(
        any(f"centroid={c}/" in f for c in probed) for f in files
    ), files
    plan = pruned_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan.split(
        "PartitionFilters"
    )[1][:120]

    got = sorted(
        tuple(r) for r in
        ivf_topk_indexed(spark, path, queries, k=5, nprobe=2).collect()
    )
    want = sorted(
        tuple(r) for r in
        ivf_topk(emb, queries, k=5, nprobe=2, centroids=cents).collect()
    )
    assert got == want


def test_token_stats_and_quality(docs):
    import re as _re

    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert ts[0]["n_tokens"] == 6
    from pregel_spark.pipeline.textstats import SUBWORD_RE
    for i, t, _ in DOCS:
        assert ts[i]["n_subwords"] == len(_re.findall(SUBWORD_RE, t)), i
    assert ts[6]["n_tokens"] == 0
    assert ts[7]["n_tokens"] == 2
    assert np.isclose(ts[7]["avg_token_len"], 3.0)
    qs = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0.0 <= qs[0]["quality"] <= 1.0
    assert qs[0]["stopword_ratio"] > qs[3]["stopword_ratio"]


def test_media_plumbing(spark):
    media = make_fake_media(spark, n=30)
    feats = media_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    rows = media.collect()
    for r in rows:
        got = by_id[r["media_id"]]
        want = _fake_decode(bytes(r["payload"]), r["kind"])
        assert len(got["features"]) == FEATURE_DIM
        assert np.allclose(got["features"], want)
        assert got["n_bytes"] == len(r["payload"])


def test_media_real_decoder_is_stubbed(spark):
    media = make_fake_media(spark, n=3)
    with pytest.raises(Exception):
        media_features(media, decoder="real").collect()


def test_embedding_near_dup_exact_and_lsh(spark):
    from pregel_spark.pipeline import embedding_near_dup_pairs

    rng = np.random.default_rng(5)
    X = rng.normal(size=(80, 16))
    X[50] = X[10] + rng.normal(scale=0.01, size=16)  # planted near-dup
    X[60] = X[20] + rng.normal(scale=0.01, size=16)
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    exact = {(r["a"], r["b"]): r["cosine"]
             for r in embedding_near_dup_pairs(emb, threshold=0.95).collect()}
    want = {}
    for i in range(80):
        for j in range(i + 1, 80):
            c = round(_cosine(X[i], X[j]), 6)
            if c >= 0.95:
                want[(i, j)] = c
    assert exact.keys() == want.keys()
    for k in want:
        assert np.isclose(exact[k], want[k], atol=1e-6)
    assert (10, 50) in exact and (20, 60) in exact
    # banded sign-LSH path finds the planted near-dups and verifies exactly
    lsh = {(r["a"], r["b"]) for r in
           embedding_near_dup_pairs(emb, threshold=0.95, mode="lsh").collect()}
    assert {(10, 50), (20, 60)} <= lsh
    assert lsh <= exact.keys()


def test_embedding_lsh_recall_on_testdata(spark):
    """The auto-mode scale path (banded sign-LSH) must recover nearly
    every exact pair on the real sf0.01 embeddings at the contract's
    threshold 0.4 — the worst case for sign-LSH (low-cosine pairs flip
    many signs)."""
    from pregel_spark.pipeline import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {(r["a"], r["b"]): r["cosine"]
             for r in embedding_near_dup_pairs(emb, threshold=0.4, mode="exact").collect()}
    lsh = {(r["a"], r["b"]): r["cosine"]
           for r in embedding_near_dup_pairs(emb, threshold=0.4, mode="lsh").collect()}
    assert set(lsh) <= set(exact)          # precision 1 (exact verify)
    for p, c in lsh.items():
        assert np.isclose(c, exact[p], atol=1e-6)
    recall = len(lsh) / max(len(exact), 1)
    assert recall >= 0.95, (recall, len(exact), len(lsh))


def test_simhash_banding_recall(spark):
    """Pigeonhole banding must have recall 1 at EVERY max_hamming: the
    returned pair set equals the exact all-pairs Hamming filter over
    the fingerprints (the round-1 fixed 4x16 banding silently dropped
    pairs for max_hamming > 3)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=20).tolist()))
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["id"]: r["fp"] for r in simhash_fingerprints(docs).collect()}

    def ham(a, b):
        return bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")

    for mh in (3, 10, 16):
        got = {(r["a"], r["b"]) for r in
               simhash_pairs(docs, max_hamming=mh).collect()}
        want = {(a, b) for a, b in combinations(sorted(fps), 2)
                if ham(a, b) <= mh}
        assert got == want, (mh, len(got), len(want))


def test_winnow_short_docs_have_no_fingerprints(spark):
    """Docs shorter than k chars (incl. empty/null) have no k-grams —
    they must yield NO fingerprints and never appear as near-dup pairs
    (regression: sequence(1,0) auto-descends and fabricated grams)."""
    from pregel_spark.pipeline import winnow_fingerprints, winnow_near_dup_pairs

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, ""),
            (2, "short"),
            (3, "tiny"),
            (4, None),
            (5, "a document comfortably longer than eight characters"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=8, window=4).collect()
    assert {r["doc_id"] for r in fps} == {5}
    pairs = winnow_near_dup_pairs(docs, threshold=0.1).collect()
    assert pairs == []


def test_winnow_fingerprints_properties(spark):
    """Winnowing invariants: determinism, shift-robustness (inserting a
    prefix keeps most fingerprints), and near-disjointness for
    unrelated text."""
    from pregel_spark.pipeline import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),                      # identical
            (2, "NEW PREFIX " + base),      # shifted content
            (3, "zebra xylophone quartz jackdaw vermilion obsidian nimbus"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(docs, k=8, window=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] == fps[1]                       # deterministic
    overlap = len(fps[0] & fps[2]) / len(fps[0])
    assert overlap >= 0.6, overlap                # shift-robust
    cross = len(fps[0] & fps[3]) / len(fps[0])
    assert cross <= 0.1, cross                    # unrelated ~disjoint


def test_winnow_near_dup_pairs(spark):
    from pregel_spark.pipeline import winnow_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),
            (2, "NEW PREFIX " + base),
            (3, "zebra xylophone quartz jackdaw vermilion obsidian nimbus"),
        ],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]): r["overlap"]
           for r in winnow_near_dup_pairs(docs, threshold=0.5).collect()}
    assert got[(0, 1)] == 1.0            # identical docs: full overlap
    assert (0, 2) in got and (1, 2) in got   # shifted content found
    assert all(3 not in p for p in got)      # unrelated doc excluded


def test_near_dup_clusters_transitive(spark, docs):
    """Clusters are the transitive closure of the pair relation (A~B,
    B~C => same cluster even if A!~C), keeper = min doc id; singletons
    keep themselves. Python union-find over the same pair set is the
    oracle."""
    from pregel_spark.pipeline import near_dup_clusters, ngram_jaccard_pairs

    thr = 0.3
    pairs = [(r["a"], r["b"]) for r in
             ngram_jaccard_pairs(docs, threshold=thr, k=3).collect()]
    parent = {i: i for i, _, _ in DOCS}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i, _, _ in DOCS}

    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
           near_dup_clusters(spark, docs, threshold=thr).collect()}
    assert {d: c for d, (c, _) in got.items()} == want
    for d, (c, keep) in got.items():
        assert keep == (d == c)


def test_near_dup_clusters_id_width(spark):
    """Ids >= 10^12 (e.g. 64-bit hash-derived) must cluster to the
    NUMERIC min (19-digit padding regression: 12-digit width silently
    mis-sorted them); negative ids fail fast."""
    from pregel_spark.pipeline import near_dup_clusters

    big = 5_000_000_000_000  # > 10^12
    docs = spark.createDataFrame(
        [(big + 7, "the cat sat on the mat today"),
         (big + 3, "the cat sat on the mat today"),
         (12, "the cat sat on the mat today")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
           near_dup_clusters(spark, docs, threshold=0.3).collect()}
    assert got == {12: (12, True), big + 3: (12, False), big + 7: (12, False)}

    neg = spark.createDataFrame(
        [(-1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="non-negative"):
        near_dup_clusters(spark, neg, threshold=0.3)


def test_embedding_auto_routes_at_exact_limit(spark):
    """mode='auto' picks the cartesian at n <= exact_limit and banded
    LSH above (checked structurally: the LSH plan joins on band/key,
    the exact plan is a non-equi cross product)."""
    from pregel_spark.pipeline import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    X = rng.normal(size=(30, 8))
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(30)],
        "vec_id long, embedding array<double>",
    )

    def plan_of(**kw):
        return (
            embedding_near_dup_pairs(emb, threshold=0.9, **kw)
            ._jdf.queryExecution().executedPlan().toString()
        )

    at_limit = plan_of(n_rows=8_000)     # == exact_limit -> cartesian
    above = plan_of(n_rows=8_001)        # one past -> LSH
    assert "NestedLoop" in at_limit or "CartesianProduct" in at_limit
    assert "NestedLoop" not in above and "CartesianProduct" not in above


def test_containment_pairs_vs_python_oracle(docs, spark):
    from pregel_spark.pipeline import containment_pairs

    got = {
        (r.inner_id, r.outer_id): r.containment
        for r in containment_pairs(docs, threshold=0.3, k=3).collect()
    }
    want = {}
    sh = {i: _shingles(t) for i, t, _ in DOCS if _shingles(t)}
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        for inner, outer in ((a, b), (b, a)):
            c = inter / len(sh[inner])
            if c >= 0.3:
                want[(inner, outer)] = round(c, 6)
    assert got == pytest.approx(want)


def test_containment_catches_quote_inclusion(spark):
    from pregel_spark.pipeline import containment_pairs

    quoted = "alpha beta gamma delta epsilon zeta"
    wrapper = "intro words here " + quoted + " outro trailing words end"
    d = spark.createDataFrame(
        [(1, quoted), (2, wrapper)], "doc_id long, text string"
    )
    rows = containment_pairs(d, threshold=0.9, k=3).collect()
    # doc 1's shingles all appear inside doc 2 -> containment 1.0;
    # Jaccard would be ~4/17 and miss it entirely
    assert [(r.inner_id, r.outer_id, r.containment) for r in rows] == [(1, 2, 1.0)]
