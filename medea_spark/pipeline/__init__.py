"""Large-scale training-data pipeline operators: dedup, similarity
search, text analysis, multimodal column plumbing."""

from medea_spark.pipeline.dedup import (
    exact_duplicate_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_duplicate_groups,
    simhash_near_dup_pairs,
)
from medea_spark.pipeline.ivf import (
    IvfIndex,
    assign_cells,
    build_ivf_index,
    build_ivf_index_hashseed,
    ivf_ann_topk,
)
from medea_spark.pipeline.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_TABLE_SCHEMA,
    extract_features,
    resize_media,
    frame_sample_plan,
    synthetic_media_table,
)
from medea_spark.pipeline.asof import asof_join
from medea_spark.pipeline.chunking import chunk_documents
from medea_spark.pipeline.normalize import normalize_table, normalize_text
from medea_spark.pipeline.prep import prepare_corpus
from medea_spark.pipeline.decontaminate import contamination_report, ngram_hashes, ngram_hashes_from_tokens
from medea_spark.pipeline.redact import PII_PATTERNS, pii_counts, redact_pii, scrub_table
from medea_spark.pipeline.components import (
    connected_components,
    duplicate_clusters,
    quality_keepers,
)
from medea_spark.pipeline.sampling import (
    build_training_mix,
    deterministic_sample,
    mixture_rates,
    sample_predicate,
    stratified_sample,
)
from medea_spark.pipeline.lm import bigram_counts, perplexity, unigram_counts
from medea_spark.pipeline.sessions import session_stats, sessionize
from medea_spark.pipeline.similarity import (
    embedding_stats,
    random_projection,
    brute_force_topk,
    cosine,
    cosine_near_dup_pairs,
    lsh_ann_topk,
    lsh_bucket,
    lsh_signatures,
    plane_component,
)
from medea_spark.pipeline.textstats import (
    repetition_stats,
    tfidf_top_terms,
    LANG_ORDER,
    LANG_PROFILES,
    doc_trigrams,
    fingerprint,
    lang_id,
    lang_id_keyword,
    punct_ratio,
    quality_score,
    stopword_ratio,
    text_profile,
    token_count_bpe,
    token_count_ws,
)

__all__ = [
    "FEATURE_SCHEMA",
    "MEDIA_TABLE_SCHEMA",
    "brute_force_topk",
    "cosine",
    "cosine_near_dup_pairs",
    "exact_duplicate_groups",
    "extract_features",
    "resize_media",
    "IvfIndex",
    "assign_cells",
    "build_ivf_index",
    "build_ivf_index_hashseed",
    "fingerprint",
    "ivf_ann_topk",
    "frame_sample_plan",
    "LANG_ORDER",
    "LANG_PROFILES",
    "doc_trigrams",
    "asof_join",
    "chunk_documents",
    "embedding_stats",
    "random_projection",
    "normalize_table",
    "prepare_corpus",
    "normalize_text",
    "contamination_report",
    "ngram_hashes",
    "ngram_hashes_from_tokens",
    "repetition_stats",
    "tfidf_top_terms",
    "PII_PATTERNS",
    "pii_counts",
    "redact_pii",
    "scrub_table",
    "build_training_mix",
    "connected_components",
    "deterministic_sample",
    "duplicate_clusters",
    "lang_id",
    "lang_id_keyword",
    "mixture_rates",
    "sample_predicate",
    "session_stats",
    "sessionize",
    "stratified_sample",
    "lsh_ann_topk",
    "lsh_bucket",
    "lsh_signatures",
    "plane_component",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "punct_ratio",
    "quality_score",
    "shingles",
    "simhash",
    "simhash_duplicate_groups",
    "simhash_near_dup_pairs",
    "stopword_ratio",
    "synthetic_media_table",
    "text_profile",
    "token_count_bpe",
    "token_count_ws",
]
