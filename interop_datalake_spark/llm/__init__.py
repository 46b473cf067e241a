from interop_datalake_spark.llm.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from interop_datalake_spark.llm.similarity import brute_force_topk, sign_lsh_buckets

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash",
    "brute_force_topk",
    "sign_lsh_buckets",
]
