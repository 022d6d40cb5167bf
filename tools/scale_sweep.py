#!/usr/bin/env python
"""Full-registry single-pass timing sweep at one scale factor —
the LANDMINE DETECTOR behind the per-query scale probe: the probe
(tools/scale_probe.py) fits slopes for a curated set; this sweep runs
EVERY registered query once at the given sf dir (default the sf1
fixture from tools/gen_sfscale.py) and prints a sorted timing report,
so a query whose plan silently degenerates at scale (quadratic row
expansion, AQE-undersized shuffle, driver-paced loop) shows up as a
wall-clock outlier even if it was never probed.

Round-13 origin: the sf1 probe caught q_dedup_semantic's pair stage
running as 2 straggler tasks (>9 min); this sweep then caught
q_knn_per_vector with the same disease (398 s → 2.6 s after the arrow
matmul fix). Run it each round after registering new operators.

Usage: python tools/scale_sweep.py [sf_dir] [--skip-prefix=q_streaming_]
Prints one line per query as it completes (slowest last can be
interrupted without losing output) and a final JSON summary line.

Tier handling (round 15): queries tagged ``tier="demo"`` / ``"oracle"``
in the registry (structurally bounded API demos and brute-force oracle
twins — see plans/registry.py) are skipped BY TAG and REPORTED in the
summary's ``skipped_tiers`` — no silent caps. ``--include-all`` runs
them anyway (the r14 no-skip run measured q_similarity_join_lsh at
1021 s sf1 this way).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/sfscale/sf1"
    skip_prefixes = tuple(
        a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--skip-prefix=")
    )
    skip_names = {
        n
        for a in sys.argv[1:]
        if a.startswith("--skip=")
        for n in a.split("=", 1)[1].split(",")
    }

    include_all = "--include-all" in sys.argv[1:]

    from concurrent.futures import ThreadPoolExecutor

    from nyc_taxi_etl_pyspark_spark.plans.registry import all_query_specs
    from nyc_taxi_etl_pyspark_spark.session import get_spark
    from nyc_taxi_etl_pyspark_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    with ThreadPoolExecutor(max_workers=len(TABLES)) as ex:
        list(ex.map(lambda t: load_table(spark, sf_dir, t).count(), TABLES))

    specs = all_query_specs()
    times: dict[str, float] = {}
    failed: dict[str, str] = {}
    skipped_tiers: dict[str, str] = {}
    for name, spec in sorted(specs.items()):
        if (skip_prefixes and name.startswith(skip_prefixes)) or (
            name in skip_names
        ):
            continue
        if spec.tier != "production" and not include_all:
            # bounded-by-design tiers are skipped BY TAG and reported —
            # never a silent cap (they stay oracle-checked in preflight)
            skipped_tiers[name] = spec.tier
            print(f"  SKIPPED  {name} (tier={spec.tier})", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).count()
            times[name] = round(time.perf_counter() - t0, 2)
            print(f"{times[name]:9.2f}s  {name}", flush=True)
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            failed[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"   FAILED  {name}: {failed[name]}", flush=True)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(times),
                "total_s": round(sum(times.values()), 1),
                "slowest": dict(ranked[:15]),
                "failed": failed,
                "skipped_tiers": skipped_tiers,
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
