#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "headline_queries_wall_s", "value": <total>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

Each query is executed to completion engine-side via a count()-style
action over the materialized result (collect would bill driver transfer
for wide results; count forces the full plan).

Baseline context (BASELINE.md): the reference's full ETL over 12.38M rows
ran 124.79 s on a Dataproc cluster; the proportional budget at sf0.1
(~600k lineitem rows) is a few seconds total — the engine's target is to
stay well inside 2× of that.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward the shapes that
# dominate at 100 TB (shuffling aggs, joins, windows, dedup, similarity).
HEADLINE = [
    "q_agg_by_hour",
    "q_agg_sum_min_max_stddev",
    "q_filter_bbox",
    "q_join_inner",
    "q_join_snowflake",
    "q_join_range",
    "q_join_asof",
    "q_window_topk_per_group",
    "q_window_rolling",
    "q_window_tumbling",
    "q_sessionize",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    "q_topk_cosine",
    "q_text_tokenstats",
    "q_array_explode",
    "q_etl_pipeline",
    "q_multimodal_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from nyc_taxi_etl_pyspark_spark.session import get_spark
    from nyc_taxi_etl_pyspark_spark.plans.registry import all_queries
    from nyc_taxi_etl_pyspark_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="bench")
    queries = all_queries()

    # Warm the input cache once (the driver-visible cost of re-reading ten
    # small parquet files per query is local-mode noise, not engine cost).
    # Counts run concurrently — local[32] schedules them in parallel.
    t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(TABLES)) as ex:
        list(ex.map(lambda t: load_table(spark, sf_dir, t).count(), TABLES))
    # Pre-warm the Python/Arrow worker pool so mapInPandas queries measure
    # plan cost, not one-time worker fork + Arrow init.
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    load_s = time.perf_counter() - t0

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.count()
        per_query[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_s",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(per_query),
                "table_load_s": round(load_s, 4),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
