"""Large-scale training-data pipeline operators.

First-class components beyond the reference's surface (BASELINE.json
north star): deduplication (exact, fingerprint, MinHash-LSH, SimHash,
n-gram Jaccard), embedding similarity search (brute-force + IVF),
text analysis, and multimodal column plumbing.
"""

from crane_spark.llm.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_band_pairs,
    ngram_jaccard_pairs,
    simhash_groups,
)
from crane_spark.llm.similarity import brute_force_topk, ivf_assign

__all__ = [
    "exact_dedup",
    "fingerprint_dedup",
    "minhash_band_pairs",
    "simhash_groups",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "ivf_assign",
]
