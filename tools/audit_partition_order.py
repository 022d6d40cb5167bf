#!/usr/bin/env python
"""Full-fleet partition-order determinism audit (SCALE.md discipline).

Runs EVERY oracle-checked registry query twice at sf0.01 under
deliberately different parallelism — local[7] with 5 vs 32 shuffle
partitions (different float-summation orders, different task
boundaries) — and fails if any query's normalized output differs.
This is what guarantees the driver's DuckDB comparison stays green on
whatever executor layout it happens to run.

Usage: python tools/audit_partition_order.py [sf_dir]
Prints one line per divergent query (none expected) and a summary.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from nyc_taxi_etl_pyspark_spark.plans.registry import (
        all_oracle_sql,
        all_queries,
    )
    from nyc_taxi_etl_pyspark_spark.session import get_spark
    from tests.oracle_harness import normalize_frame

    queries = all_queries()
    names = sorted(all_oracle_sql())
    if len(sys.argv) > 2:
        # solo audit of freshly-added queries: trailing args are
        # substring filters over the query names
        pats = sys.argv[2:]
        names = [n for n in names if any(p in n for p in pats)]
    spark = get_spark(app_name="partition-order-audit", master="local[7]")
    bad: list[str] = []
    t0 = time.perf_counter()
    for i, name in enumerate(names, 1):
        frames = []
        for parts in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            frames.append(
                normalize_frame(queries[name](spark, sf_dir).toPandas())
            )
        if frames[0] != frames[1]:
            bad.append(name)
            print(f"DIVERGENT: {name}")
        if i % 20 == 0:
            print(
                f"  ... {i}/{len(names)} audited "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
    print(
        f"audited {len(names)} oracle queries at {sf_dir}: "
        f"{len(bad)} divergent ({time.perf_counter() - t0:.0f}s)"
    )
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
