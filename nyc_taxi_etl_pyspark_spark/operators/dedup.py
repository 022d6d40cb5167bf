"""Deduplication operators (SURVEY.md §2.12 — LLM-data-pipeline core).

Four tiers, all shuffle-bounded (no O(n²) all-pairs stage anywhere):

- exact:          one hash-aggregate shuffle on the key.
- n-gram Jaccard: blocked all-pairs within small explicit groups (for
                  oracle-checkable verification at test scale).
- MinHash + LSH:  shingle → k minhashes → band buckets → join only within
                  buckets. The 100 TB near-dup path: candidate pairs are
                  linear-ish in data size, tunable by (k, bands).
- SimHash:        64-bit fingerprint, bucket by rotated prefixes; Hamming
                  filter within buckets.

Determinism: every "keep one per group" decision is an explicit
``row_number() == 1`` over a total order — never ``dropDuplicates``,
whose survivor depends on partition scan order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.text import token_shingles, tokens_col


def dedup_exact(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep exactly one row per ``keys`` group: the first under
    ``order_by`` (deterministic alternative to the reference-era
    ``dropDuplicates``). One shuffle; no driver involvement."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All candidate pairs within a blocking group whose token-shingle
    Jaccard ≥ threshold. Exact (set-based) Jaccard via
    ``array_intersect`` / ``array_union`` — fully Catalyst, oracle-checkable.

    The explicit ``block_col`` keeps the pair space quadratic only within
    blocks; for unblocked 100 TB corpora use ``minhash_lsh_dedup`` below,
    which *discovers* blocks via LSH instead of requiring one.
    """
    shingled = df.select(
        F.col(id_col),
        F.col(block_col),
        F.array_distinct(token_shingles(tokens_col(F.col(text_col)), shingle_n)).alias(
            "__sh"
        ),
    )
    a = shingled.select(
        F.col(id_col).alias("id_a"), F.col(block_col).alias("__blk"), F.col("__sh").alias("__sh_a")
    )
    b = shingled.select(
        F.col(id_col).alias("id_b"), F.col(block_col).alias("__blk"), F.col("__sh").alias("__sh_b")
    )
    pairs = a.join(b, on="__blk").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        pairs.select(
            "id_a", "id_b", F.col("__blk").alias("block"), stable_round(jac, 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """k-minhash signature per document:
    minhash_i(doc) = min over shingles of xxhash64(shingle, seed=i).

    Implementation: explode shingles to rows, hash each shingle exactly
    once per seed (xxhash64 is codegen'd JVM work), then 32 ``min``
    aggregates back to one row per doc. The groupBy benefits from
    map-side partial aggregation — shuffle volume is ~|docs|×k longs, not
    |shingles| — and sidesteps the interpreted-eval cost of nesting the
    shingle computation inside k higher-order-function copies (measured
    10×+ slower at bench scale). xxhash64 is seeded and deterministic, so
    signatures are reproducible across runs/clusters.
    """
    shingles = F.array_distinct(token_shingles(tokens_col(F.col(text_col)), shingle_n))
    exploded = df.select(F.col(id_col), F.explode(shingles).alias("__shingle"))
    return exploded.groupBy(id_col).agg(
        F.array(
            *[
                F.min(F.xxhash64(F.col("__shingle"), F.lit(i)))
                for i in range(num_hashes)
            ]
        ).alias("minhash_sig")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the k-hash signature into
    ``bands`` groups of k/bands rows, bucket on (band_id, band_hash), and
    emit distinct candidate pairs that share ≥1 bucket.

    Scale shape: explode is ``bands``×|docs| rows, the bucket join only
    touches rows sharing a bucket — the standard LSH trade (recall vs
    candidate volume) tuned by (num_hashes, bands). Returns
    (id_a, id_b, n_shared_buckets); feed survivors into exact Jaccard to
    drop false positives.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("minhash_sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_buckets"))
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hamming_threshold: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup candidates: 64-bit token-weighted fingerprint,
    blocked on 4 rotated ``prefix_bits`` prefixes (two fingerprints within
    Hamming distance d share at least one of 4 bands untouched when
    d ≤ 3), Hamming-filtered within blocks via ``bit_count(a XOR b)``.
    """
    # classic simhash: per-bit vote (+1 if the token hash has the bit set,
    # −1 otherwise), fingerprint bit = sign of the vote. Same
    # explode + partial-aggregate shape as minhash_signatures: hash each
    # token once (codegen'd), 64 sum-aggregates with map-side combine.
    tokens = tokens_col(F.col(text_col))
    hashed = df.select(
        F.col(id_col), F.explode(tokens).alias("__tok")
    ).withColumn("__h", F.xxhash64("__tok"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned(F.col("__h"), bit).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"__v{bit}")
            for bit in range(64)
        ]
    )
    fingerprint = None
    for bit in range(64):
        bit_val = F.when(
            F.col(f"__v{bit}") > 0, F.shiftleft(F.lit(1).cast("long"), bit)
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = bit_val if fingerprint is None else fingerprint + bit_val
    sim = votes.select(F.col(id_col), fingerprint.alias("simhash"))

    bands = []
    for band in range(4):
        shift = band * prefix_bits
        bands.append(
            F.struct(
                F.lit(band).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), shift)
                .bitwiseAND(F.lit((1 << prefix_bits) - 1))
                .alias("prefix"),
            )
        )
    blocked = sim.select(id_col, "simhash", F.explode(F.array(*bands)).alias("bb")).select(
        id_col, "simhash", "bb.band", "bb.prefix"
    )
    a = blocked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "band", "prefix"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "band", "prefix"
    )
    pairs = (
        a.join(b, on=["band", "prefix"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= hamming_threshold)
