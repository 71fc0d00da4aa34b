from .numeric import dec, dsum_round, davg_round
from .text import (
    STOPWORDS,
    char_ngrams,
    doc_fingerprint,
    language_id,
    punct_ratio,
    quality_score,
    regex_token_count,
    shingles,
    stopword_ratio,
    tokens,
    whitespace_token_count,
)
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "dec",
    "dsum_round",
    "davg_round",
    "STOPWORDS",
    "char_ngrams",
    "doc_fingerprint",
    "language_id",
    "punct_ratio",
    "quality_score",
    "regex_token_count",
    "shingles",
    "stopword_ratio",
    "tokens",
    "whitespace_token_count",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
