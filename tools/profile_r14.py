#!/usr/bin/env python
"""Round-14 profiling helper: per query, separate driver-side build time
(Python plan construction) from engine execution (count action), best-of-N
each, matching bench.py's cached-table preload. Usage:

    python tools/profile_r14.py q_dedup_semantic q_similarity_join_md5 ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-r14")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    queries = e.queries()
    # preload the same cached tables bench.py warms
    from concurrent.futures import ThreadPoolExecutor

    from nyc_taxi_etl_pyspark_spark.sources.tables import TABLES, load_table

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda t: load_table(spark, sf_dir, t).count(), TABLES))

    for name in names:
        builds, execs = [], []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"{name}: build={min(builds):.3f}s exec={min(execs):.3f}s "
            f"(builds={[round(b,2) for b in builds]}, "
            f"execs={[round(x,2) for x in execs]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
