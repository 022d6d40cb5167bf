from nyc_taxi_etl_pyspark_spark.operators.joins import (
    asof_join,
    broadcast_lookup_join,
    range_join_bucketed,
)
from nyc_taxi_etl_pyspark_spark.operators.dedup import (
    dedup_exact,
    dedup_ngram_jaccard,
    minhash_signatures,
    minhash_lsh_dedup,
    simhash_dedup,
)
from nyc_taxi_etl_pyspark_spark.operators.similarity import (
    brute_force_topk_cosine,
    cosine_pairs_within_group,
    ivf_topk_cosine,
)

__all__ = [
    "asof_join",
    "broadcast_lookup_join",
    "range_join_bucketed",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_signatures",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "brute_force_topk_cosine",
    "cosine_pairs_within_group",
    "ivf_topk_cosine",
]
