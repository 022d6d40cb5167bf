from nyc_taxi_etl_pyspark_spark.functions.vectors import (
    cosine_similarity_col,
    dot_col,
    l2_norm_col,
)
from nyc_taxi_etl_pyspark_spark.functions.text import (
    char_ngrams,
    fingerprint_md5,
    stopword_ratio_col,
    token_shingles,
    tokens_col,
)

__all__ = [
    "cosine_similarity_col",
    "dot_col",
    "l2_norm_col",
    "tokens_col",
    "token_shingles",
    "char_ngrams",
    "stopword_ratio_col",
    "fingerprint_md5",
]
