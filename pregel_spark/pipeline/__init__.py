"""Training-data pipeline operators over document/embedding tables:
deduplication, similarity search, text analysis, multimodal plumbing.

All hot paths are native pyspark.sql.functions (JVM, whole-stage
codegen); Python appears only as Arrow-batched pandas UDFs where a
kernel is genuinely non-expressible (k-means assignment, the stubbed
media decode) — never per-row Python UDFs.
"""

from .textstats import (
    fingerprint,
    pmi_ngrams,
    language_id,
    pii_counts,
    quality_score,
    repetition_stats,
    token_stats,
    top_ngrams,
    unigram_logprob,
    winnow_fingerprints,
    winnow_near_dup_pairs,
)
from .dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    incremental_exact,
    minhash_lsh_pairs,
    near_dup_clusters,
    containment_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from .curation import (
    curate_corpus,
    duckdb_stratified_sample_pred,
    importance_weights,
    resample_top_frac,
    stratified_sample,
    stratified_sample_pred,
)
from .decontam import contamination_overlap
from .sessions import session_stats, sessionize
from .ranking import (
    bm25_scores,
    bm25_topk,
    doc_lengths,
    term_index,
    tfidf_scores,
)
from .simsearch import (
    brute_force_topk,
    ivf_topk,
    ivf_topk_indexed,
    write_ivf_index,
)
from .cluster import kmeans_assign, kmeans_fit, semantic_dedup
from .stats import exact_quantiles, quantile_bins, quantile_table
from .sketch import cm_estimate, count_min, hll_estimate, hll_registers
from .lines import (
    boilerplate_lines,
    chunk_lines,
    line_dedup,
    pack_sequences,
    split_lines,
    strip_boilerplate,
)
from .spans import duplicate_spans, kgram_occurrences, strip_duplicate_spans
from .bpe import bpe_encode_stats, bpe_learn, segment_words, word_census
from .classify import nb_score, nb_train
from .multimodal import (
    decode_media_batch,
    media_feature_rows,
    media_features,
    media_from_documents,
)

__all__ = [
    "boilerplate_lines",
    "chunk_lines",
    "incremental_exact",
    "cm_estimate",
    "count_min",
    "hll_estimate",
    "hll_registers",
    "line_dedup",
    "duplicate_spans",
    "kgram_occurrences",
    "strip_duplicate_spans",
    "bpe_encode_stats",
    "bpe_learn",
    "nb_score",
    "nb_train",
    "segment_words",
    "word_census",
    "strip_boilerplate",
    "pack_sequences",
    "split_lines",
    "top_ngrams",
    "exact_quantiles",
    "quantile_bins",
    "quantile_table",
    "embedding_near_dup_pairs",
    "fingerprint",
    "language_id",
    "pii_counts",
    "pmi_ngrams",
    "quality_score",
    "repetition_stats",
    "token_stats",
    "unigram_logprob",
    "winnow_fingerprints",
    "winnow_near_dup_pairs",
    "exact_dedup",
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "containment_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "contamination_overlap",
    "curate_corpus",
    "importance_weights",
    "resample_top_frac",
    "semantic_dedup",
    "stratified_sample",
    "stratified_sample_pred",
    "duckdb_stratified_sample_pred",
    "sessionize",
    "session_stats",
    "bm25_scores",
    "bm25_topk",
    "doc_lengths",
    "term_index",
    "tfidf_scores",
    "brute_force_topk",
    "kmeans_assign",
    "kmeans_fit",
    "ivf_topk",
    "ivf_topk_indexed",
    "write_ivf_index",
    "decode_media_batch",
    "media_feature_rows",
    "media_features",
    "media_from_documents",
]
