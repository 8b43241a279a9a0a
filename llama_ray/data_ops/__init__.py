from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup,
    simhash_buckets,
    ngram_jaccard_pairs,
    embedding_near_dup,
)
from .text import language_id, quality_score, token_counts, fingerprint  # noqa: F401
from .ann import knn_brute_force, knn_lsh  # noqa: F401
