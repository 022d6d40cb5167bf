#!/usr/bin/env python
"""The LLM-training-corpus pipeline, end to end — the engine's north-star
composition (SURVEY.md §2.12) as ONE lazy plan chain a user would
actually run: ingest → exact dedup → near-dup cluster survivors →
quality gate → mixture stats → sequence packing → curated shards.

Every stage is an existing library operator (the same ones the oracle
suite verifies one by one); this example shows they COMPOSE — Catalyst
sees the whole chain, so column pruning and filter pushdown cross stage
boundaries, and nothing materializes to the driver at any step. At
100 TB the identical code runs with the exact-Jaccard verification tier
swapped for MinHash-LSH-only pairs and the exact percentiles for
sketches (each stage's docstring names its swap).

Run: python examples/corpus_pipeline_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.text import (
    fingerprint_md5,
    quality_gate,
    tokens_col,
)
from nyc_taxi_etl_pyspark_spark.operators.dedup import (
    dedup_exact,
    dedup_survivors,
    minhash_lsh_dedup,
)
from nyc_taxi_etl_pyspark_spark.session import get_spark
from nyc_taxi_etl_pyspark_spark.sources.io import write_parquet_partitioned
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SEQ_LEN = 4096


def build_curated_corpus(spark, sf_dir: str):
    """documents → curated training corpus, as one composed lazy plan.
    Returns (curated_df, stats_dict_of_dataframes)."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. EXACT dedup: one row per content fingerprint (md5 of the text),
    #    deterministic survivor (min doc_id) — never dropDuplicates.
    docs_fp = docs.withColumn("fingerprint", fingerprint_md5(F.col("text")))
    exact_unique = dedup_exact(docs_fp, ["fingerprint"], ["doc_id"])

    # 2. NEAR-dup dedup: MinHash-LSH candidate pairs (OPH signatures:
    #    one hash per shingle) → connected components → canonical
    #    survivor per duplicate cluster. At 100 TB this is the dedup
    #    path; candidate volume is (num_hashes, bands)-tuned.
    pairs = minhash_lsh_dedup(
        exact_unique, "doc_id", "text", num_hashes=32, bands=8, scheme="oph"
    )
    survivors = dedup_survivors(exact_unique, pairs, "doc_id")

    # 3. QUALITY gate: C4-style filter as one Catalyst boolean — pushes
    #    down into the scan along with everything else.
    toks = tokens_col(F.col("text"))
    gated = survivors.withColumn("__toks", toks).filter(
        quality_gate(F.col("__toks"))
    )

    # 4. TOKEN accounting + SEQUENCE packing: per-source concat-and-chunk
    #    into SEQ_LEN-token training sequences (sharded cumsum window —
    #    never a global single-reducer running total).
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = (
        gated.withColumn("n_tokens", F.size("__toks"))
        .withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn(
            "seq_idx", F.floor(F.col("start_offset") / F.lit(SEQ_LEN)).cast("int")
        )
        .drop("__toks")
    )

    # 5. MIXTURE stats: the (lang, source) token budget — what a data
    #    mixer reads before choosing sampling rates (q_mixture_sample).
    mix = packed.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    return packed, {"mixture": mix}


def main() -> None:
    spark = get_spark(app_name="corpus-pipeline-example")
    docs = load_table(spark, SF_DIR, "documents")
    packed, stats = build_curated_corpus(spark, SF_DIR)

    n_in = docs.count()
    n_out = packed.count()
    n_seqs = packed.groupBy("source", "seq_idx").count().count()
    print(f"documents in:  {n_in}")
    print(f"curated out:   {n_out} "
          f"({100.0 * n_out / n_in:.1f}% kept after dedup + quality gate)")
    print(f"packed into:   {n_seqs} sequences of {SEQ_LEN} tokens (per-source)")
    print("mixture (lang x source token budget):")
    for r in stats["mixture"].orderBy("lang", "source").collect()[:8]:
        print(f"  {r['lang']:3s} {r['source']:6s} docs={r['n_docs']:5d} "
              f"tokens={r['n_tokens']}")

    # 6. Curated shards: partitioned by source (the shard key the packing
    #    window already co-locates on), ready for a tokenizer pass.
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "curated_corpus")
        write_parquet_partitioned(
            packed.select(
                "doc_id", "lang", "source", "text",
                "n_tokens", "start_offset", "seq_idx",
            ),
            out,
            partition_cols=["source"],
        )
        back = spark.read.parquet(out)
        assert back.count() == n_out
        print(f"wrote + verified {n_out} rows partitioned by source")

    spark.stop()


if __name__ == "__main__":
    main()
