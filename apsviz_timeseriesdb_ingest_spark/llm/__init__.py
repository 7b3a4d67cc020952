"""Large-scale training-data pipeline operators.

All hot paths are JVM-side DataFrame expressions (higher-order functions,
no row-at-a-time Python); the only Python execution is the Arrow-batched
``mapInPandas`` in ``multimodal`` where external decode libraries would
run. Hashing uses the portable md5 scheme (functions.portable_hash) in
parity mode so every operator is verifiable against a DuckDB oracle, with
an ``fast=True`` xxhash64 switch for production scale.
"""

from .text import (  # noqa: F401
    blocked_terms_expr,
    build_shingle_bloom,
    c4_line_filter,
    canonical_url,
    build_shingle_bloom_table,
    chunk_documents,
    clean_text,
    composition_drift,
    compression_ratio,
    corpus_manifest,
    corpus_mixture,
    corpus_profile,
    decontaminate,
    decontaminate_bloom,
    decontaminate_bloom_table,
    document_fingerprint,
    domain_stats,
    filter_by_domain,
    gopher_drop_reason,
    gopher_quality_stats,
    language_id,
    language_mix,
    length_buckets,
    mixture_keep_expr,
    normalize_unicode,
    pack_documents,
    quality_score,
    remove_repeated_lines,
    repeat_for_epochs,
    repetition_stats,
    scrub_pii,
    shuffle_rank,
    stratified_sample,
    text_stats,
    tf_idf_top_terms,
    token_stats,
    tokens,
    train_split,
    url_dedup,
    url_host,
    weighted_sample,
    vocabulary,
)
from .dedup import (  # noqa: F401
    cross_corpus_neardup,
    dedup_keep_representative,
    evaluate_pair_candidates,
    exact_dedup,
    lsh_pairs_from_buckets,
    minhash_band_buckets,
    minhash_lsh_pairs,
    minhash_tune,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
    word_shingles,
)
from .similarity import (  # noqa: F401
    CentroidIndex,
    CentroidTable,
    ann_assign,
    brute_force_topk,
    check_or_record_ann_layout,
    embedding_neardup_pairs,
    hash_embedding,
    hyperplane_lsh_bucket,
    ivf_assign,
    ivf_probe,
    kmeans_assign,
    probe_cells_for,
    read_ann_layout,
    semantic_dedup,
    semantic_dedup_auto,
    semantic_k,
    train_kmeans,
    train_kmeans_table,
    write_ann_layout,
)
from .multimodal import (  # noqa: F401
    extract_media_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from .incremental import (  # noqa: F401
    build_dedup_index,
    dedup_increment,
)
from .pipeline import (  # noqa: F401
    data_card,
    export_training_shards,
    attrition_report,
    corpus_signals,
    prepare_training_corpus,
)
from .spans import (  # noqa: F401
    split_sentences,
    dedup_paragraphs,
    duplicate_spans,
    mask_duplicate_spans,
)
from .bpe import (  # noqa: F401
    BpeModel,
    bpe_encode_docs,
    subword_vocabulary,
    train_bpe,
    word_pieces,
)
from .pq import (  # noqa: F401
    pq_encode,
    pq_reconstruction_error,
    pq_topk,
    train_pq,
)
from .ivfpq import (  # noqa: F401
    build_ivfpq_index,
    ivfpq_topk,
    residuals,
)
from .lm import (  # noqa: F401
    dsir_grams,
    dsir_importance_weights,
    dsir_select,
    min_k_prob,
    perplexity,
    perplexity_buckets,
    perplexity_ngram,
    train_bigram_lm,
    train_hashed_ngram_dist,
    train_ngram_lm,
)
from .graph import (  # noqa: F401
    pagerank,
)
from .unigram import (  # noqa: F401
    UnigramModel,
    train_unigram,
    unigram_encode_docs,
    unigram_word_pieces,
)
from .retrieval import (  # noqa: F401
    append_bm25_increment_txn,
    bm25_topk,
    bm25_topk_from_index,
    build_bm25_index,
    contamination_report,
    ranking_recall_at_k,
    rrf_fuse,
)
from .classifier import (  # noqa: F401
    apply_standardization,
    quality_features,
    score_logreg,
    standardize_stats,
    train_logreg,
)
from .sketches import (  # noqa: F401
    corpus_sketch,
    corpus_stats_row,
    drift_report,
    flag_drift,
    heavy_hitters_estimates,
    heavy_hitters_sketch,
    length_quantiles,
    length_sketch,
    merge_corpus_sketches,
    merge_heavy_hitters,
    merge_length_sketches,
    sketch_estimates,
)
