"""Large-scale training-data pipeline operators.

All hot paths are JVM-side DataFrame expressions (higher-order functions,
no row-at-a-time Python); the only Python execution is the Arrow-batched
``mapInPandas`` in ``multimodal`` where external decode libraries would
run. Hashing uses the portable md5 scheme (functions.portable_hash) in
parity mode so every operator is verifiable against a DuckDB oracle, with
an ``fast=True`` xxhash64 switch for production scale.
"""

from .text import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
    tokens,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from .similarity import brute_force_topk, hyperplane_lsh_bucket  # noqa: F401
from .multimodal import extract_media_features, with_binary_payload  # noqa: F401
