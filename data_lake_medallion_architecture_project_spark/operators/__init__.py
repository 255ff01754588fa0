from .dedup import exact_dedup, jaccard_similar_pairs, minhash_near_dup  # noqa: F401
from .similarity import brute_force_topk  # noqa: F401
