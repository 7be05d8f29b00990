from .dedup import (
    exact_dedup,
    minhash_neardup_pairs,
    ngram_shingles,
    simhash_buckets,
)
from .similarity import ann_topk_lsh, exact_topk_cosine

__all__ = [
    "ann_topk_lsh",
    "exact_dedup",
    "exact_topk_cosine",
    "minhash_neardup_pairs",
    "ngram_shingles",
    "simhash_buckets",
]
