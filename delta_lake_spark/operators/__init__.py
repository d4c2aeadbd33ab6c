"""Large-scale data-pipeline operators beyond the reference surface:
deduplication, similarity search, text analysis, graph algorithms,
evaluation metrics, multimodal columns.

All operators are (DataFrame, ...) -> DataFrame compositions of built-in
pyspark.sql.functions (JVM-side, whole-stage-codegen friendly); Python
touches data only in the explicitly-marked pandas-UDF paths
(multimodal decode, BLAS cosine), batched via Arrow.
"""

from .dedup import (
    containment_pairs,
    exact_dedup,
    exact_substring_scrub,
    exact_substring_spans,
    leakage_free_split,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    resolve_duplicate_clusters,
    simhash_pairs,
    tfidf_cosine_pairs,
    winnow_dup_pairs,
    winnow_fingerprints,
    word_shingles,
)
from .graph import label_propagation, pagerank
from .retrieval import hybrid_search_rrf, phrase_search
from .sampling import hamilton_allocation
from .similarity import (
    cosine_topk,
    ivf_topk,
    knn_label_transfer,
    lsh_ann_pairs,
    standardize_embeddings,
)
from .events import hourly_rate_anomalies
from .stats import (
    cohen_kappa,
    robust_group_stats,
    auc_by_group,
    auc_score,
    calibration_bins,
    threshold_sweep,
)
from .tokenizer import (
    bpe_encode,
    train_bpe_merges,
    train_unigram,
    unigram_encode,
)
from .text import (
    blocklist_matches,
    kneser_ney_bigram_model,
    kneser_ney_surprise,
    rouge_n_recall_pairs,
    build_vocabulary,
    dedup_segments,
    dsir_importance,
    hashed_linear_score,
    hashed_text_embedding,
    ngram_novelty,
    pmi_collocations,
    zipf_slope,
    chunk_documents,
    fingerprint,
    lang_id,
    pack_sequences,
    quality_score,
    redact_pii,
    repetition_ratio,
    tfidf_top_terms,
    token_stats,
)

__all__ = [
    "blocklist_matches",
    "cohen_kappa",
    "robust_group_stats",
    "rouge_n_recall_pairs",
    "kneser_ney_bigram_model",
    "kneser_ney_surprise",
    "exact_dedup",
    "exact_substring_spans",
    "exact_substring_scrub",
    "word_shingles",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "resolve_duplicate_clusters",
    "cosine_topk",
    "lsh_ann_pairs",
    "ivf_topk",
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "chunk_documents",
    "pack_sequences",
    "redact_pii",
    "repetition_ratio",
    "tfidf_top_terms",
    "build_vocabulary",
    "train_bpe_merges",
    "bpe_encode",
    "train_unigram",
    "unigram_encode",
    "winnow_fingerprints",
    "winnow_dup_pairs",
    "hashed_linear_score",
    "pagerank",
    "label_propagation",
    "dedup_segments",
    "dsir_importance",
    "hashed_text_embedding",
    "tfidf_cosine_pairs",
    "containment_pairs",
    "leakage_free_split",
    "phrase_search",
    "hybrid_search_rrf",
    "knn_label_transfer",
    "standardize_embeddings",
    "auc_score",
    "auc_by_group",
    "calibration_bins",
    "threshold_sweep",
    "zipf_slope",
    "ngram_novelty",
    "pmi_collocations",
    "hourly_rate_anomalies",
    "hamilton_allocation",
]
