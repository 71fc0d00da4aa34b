from .dedup import (
    exact_dedup,
    exact_duplicate_groups,
    minhash_signature,
    minhash_lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from .similarity import brute_force_top_k, embedding_near_dup_pairs, ivf_top_k

__all__ = [
    "exact_dedup",
    "exact_duplicate_groups",
    "minhash_signature",
    "minhash_lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "brute_force_top_k",
    "embedding_near_dup_pairs",
    "ivf_top_k",
]
