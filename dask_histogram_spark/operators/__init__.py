"""LLM-training-data pipeline operators (engine extensions beyond the
reference's histogram surface; BASELINE.json north star).

Every operator is a plain DataFrame -> DataFrame transform built from
built-in functions (JVM-side, codegen-friendly) so it inherits 100 TB
scaling from Spark's shuffle/AQE machinery; Python appears only in
Arrow-batched Pandas UDFs where vector math genuinely needs it.
"""

from .dedup import (
    dedup_clusters,
    dedup_exact,
    dedup_incremental,
    dedup_incremental_lsh,
    write_signature_table,
    word_ngram_jaccard_pairs,
    exact_dup_stats,
    jaccard_verify_pairs,
    minhash_signatures,
    minhash_banded,
    minhash_lsh_candidates,
    minhash_lsh_stats,
    ngram_jaccard_pairs,
    release_candidates_cache,
    release_clusters_checkpoint,
    simhash_signatures,
    simhash_candidates,
)
from .similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    embedding_norms,
    fit_centroids,
    build_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
    load_ivf_centroids,
    quantize_embeddings,
    quantized_cosine_expr,
)
from .pipeline import (
    contamination_check,
    hash_sample,
    hash_split,
    pack_sequences,
    stratified_sample,
    token_vocabulary,
)
from .text import (
    fingerprint,
    language_id,
    text_profile,
    normalize_text,
    quality_score,
    redact_pii,
    repetition_stats,
    text_stats,
    token_counts,
)

__all__ = [
    "brute_force_topk",
    "contamination_check",
    "dedup_clusters",
    "dedup_exact",
    "dedup_incremental",
    "dedup_incremental_lsh",
    "write_signature_table",
    "embedding_near_dup_pairs",
    "embedding_norms",
    "exact_dup_stats",
    "fingerprint",
    "fit_centroids",
    "build_ivf_index",
    "ivf_topk_indexed",
    "load_ivf_centroids",
    "hash_sample",
    "hash_split",
    "ivf_topk",
    "jaccard_verify_pairs",
    "release_candidates_cache",
    "release_clusters_checkpoint",
    "language_id",
    "normalize_text",
    "pack_sequences",
    "minhash_banded",
    "minhash_lsh_candidates",
    "minhash_lsh_stats",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_candidates",
    "simhash_signatures",
    "stratified_sample",
    "text_stats",
    "text_profile",
    "token_vocabulary",
    "quality_score",
    "quantize_embeddings",
    "quantized_cosine_expr",
    "redact_pii",
    "repetition_stats",
    "token_counts",
    "word_ngram_jaccard_pairs",
]
