#!/usr/bin/env python
"""Per-query micro-bench replicating bench.py's methodology (warm
cached tables, best-of-3 `df.count()`), for A/B-ing one optimization
without a full bench run.

Usage: python tools/microbench_r15.py <sf_dir> <query> [<query>...]
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from nyc_taxi_etl_pyspark_spark.plans.registry import all_queries
    from nyc_taxi_etl_pyspark_spark.session import get_spark
    from nyc_taxi_etl_pyspark_spark.sources.tables import TABLES, load_table

    spark = get_spark("microbench_r15")
    queries = all_queries()
    with ThreadPoolExecutor(max_workers=len(TABLES)) as ex:
        list(ex.map(lambda t: load_table(spark, sf_dir, t).count(), TABLES))
    for name in names:
        runs = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"mb:{name}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: best {min(runs)} runs {runs}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
