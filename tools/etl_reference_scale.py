#!/usr/bin/env python
"""Run the full ETL at the REFERENCE'S exact scale — 12,380,927 rows,
the row count the reference's executed notebook records surviving
cleaning (BASELINE.md; src/notebooks/etl.ipynb:342) — and print walls
next to its 124.79 s total, closing the gap between "8.5× at sf0.1"
and an apples-to-apples claim (round-11 verdict, Next round #3).

Two measured variants:

- ``from_csv``: the reference's exact entry point — CSV with header +
  inferSchema (its 25.94 s read), then clean → cache → count →
  partitioned curated write → hourly-agg write (its 98.85 s). The CSV
  is generated once on local disk from the same deterministic
  generator bench.py uses, sized so ~12.38M rows SURVIVE cleaning
  (the reference reports the post-clean count).
- ``pipeline_only``: the same ETL from an already-loaded frame —
  isolates the engine's clean+write cost from CSV parse.

Both report total wall and rows/s against the baseline's 99,214
rows/s. Machine: local[$SPARK_GRAFT_CPUS or all] vs the reference's
Dataproc cluster — single node here, cluster there, so the comparison
is conservative in our favor only if we win anyway.

Usage: python tools/etl_reference_scale.py [--rows 12380927]
Prints one JSON object; record the round's numbers in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_raw(spark, n: int):
    """The deterministic taxi-shaped frame bench.py uses (same column
    names/dtypes the reference's CSV carries), sized by ``n`` PRE-clean
    rows. Roughly 88% of generated rows survive the quality gates, so
    callers overscale n to hit a target post-clean count."""
    from pyspark.sql import functions as F

    month_s = 31 * 86400
    return spark.range(n).select(
        (F.col("id") % 7 - 1).cast("int").alias("payment_type"),
        F.timestamp_seconds(
            F.lit(1420070400) + (F.col("id") * 18) % month_s
        ).alias("tpep_pickup_datetime"),
        F.timestamp_seconds(
            F.lit(1420070400)
            + (F.col("id") * 18) % month_s
            + (F.col("id") % 200) * 66
        ).alias("tpep_dropoff_datetime"),
        ((F.col("id") % 50).cast("double") / 10.0 - 0.4).alias(
            "trip_distance"
        ),
        ((F.col("id") % 90).cast("double") - 2.0).alias("fare_amount"),
        ((F.col("id") % 95).cast("double") - 1.0).alias("total_amount"),
        (F.col("id") % 8 - 1).cast("int").alias("passenger_count"),
        (F.lit(-74.35) + (F.col("id") % 100).cast("double") / 125.0).alias(
            "pickup_longitude"
        ),
        (F.lit(40.45) + (F.col("id") % 60).cast("double") / 100.0).alias(
            "pickup_latitude"
        ),
        (F.lit(-74.25) + (F.col("id") % 80).cast("double") / 100.0).alias(
            "dropoff_longitude"
        ),
        (F.lit(40.55) + (F.col("id") % 40).cast("double") / 80.0).alias(
            "dropoff_latitude"
        ),
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=12_380_927,
                    help="target POST-CLEAN row count (reference: "
                    "12,380,927)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("etl-reference-scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from nyc_taxi_etl_pyspark_spark.etl import clean_and_transform, run_etl

    work = args.workdir or tempfile.mkdtemp(prefix="etl_refscale_")
    os.makedirs(work, exist_ok=True)
    try:
        # calibrate the pre-clean row count so the POST-clean count
        # lands on the reference's exact figure: measure survival on a
        # 1M-row slice, overscale, then trim with a limit after clean
        # is NOT possible (limit would skew writes) — instead binary
        # nudge the generator size (survival is deterministic in n).
        probe_n = 1_000_000
        survive = clean_and_transform(
            spark, synth_raw(spark, probe_n)
        ).count()
        n_pre = int(args.rows * probe_n / survive)

        def post(n: int) -> int:
            return clean_and_transform(spark, synth_raw(spark, n)).count()

        # post(n) is MONOTONE non-decreasing in n (appending a pre-clean
        # row adds 0 or 1 surviving rows), and increments by ≤1 — so
        # every target is exactly reachable: linear refine to bracket,
        # then binary search to the EXACT reference row count.
        got = post(n_pre)
        for _ in range(3):
            if got == args.rows:
                break
            n_pre += round((args.rows - got) * n_pre / max(got, 1))
            got = post(n_pre)
        if got != args.rows:
            lo, hi = n_pre, n_pre
            step = 64
            while post(lo) > args.rows:
                lo -= step
                step *= 4
            step = 64
            while post(hi) < args.rows:
                hi += step
                step *= 4
            while lo < hi:
                mid = (lo + hi) // 2
                if post(mid) < args.rows:
                    lo = mid + 1
                else:
                    hi = mid
            n_pre = lo
            got = post(n_pre)
        raw = synth_raw(spark, n_pre)
        n_clean_expect = got

        # ---- variant 1: the reference's entry point (CSV on disk) ----
        csv_dir = os.path.join(work, "raw_csv")
        t0 = time.perf_counter()
        raw.write.mode("overwrite").option("header", True).csv(csv_dir)
        csv_write_s = time.perf_counter() - t0
        csv_bytes = sum(
            os.path.getsize(os.path.join(csv_dir, f))
            for f in os.listdir(csv_dir)
            if f.endswith(".csv")
        )

        # JIT warm-up at 50k rows (bench.py's rationale: generated
        # classes compile on the pipeline's own first execution)
        with tempfile.TemporaryDirectory() as td:
            run_etl(
                spark, raw.limit(50_000), td + "/curated", td + "/agg"
            )

        t0 = time.perf_counter()
        raw_csv = (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(csv_dir)
        )
        read_touch = raw_csv.count()  # the reference's read cell counts
        t_read = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_csv = run_etl(
            spark,
            raw_csv,
            os.path.join(work, "curated_csv"),
            os.path.join(work, "agg_csv"),
        )
        t_pipe_csv = time.perf_counter() - t0
        total_csv = t_read + t_pipe_csv

        # ---- variant 2: pipeline-only (pre-loaded frame) ----
        t0 = time.perf_counter()
        res_mem = run_etl(
            spark,
            raw,
            os.path.join(work, "curated_mem"),
            os.path.join(work, "agg_mem"),
        )
        t_pipe_mem = time.perf_counter() - t0

        out = {
            "target_rows_post_clean": args.rows,
            "rows_post_clean": res_csv["rows_clean"],
            "rows_post_clean_expected": n_clean_expect,
            "rows_pre_clean": n_pre,
            "csv_bytes": csv_bytes,
            "csv_gen_write_s": round(csv_write_s, 2),
            "from_csv": {
                "read_infer_schema_s": round(t_read, 2),
                "read_rows": read_touch,
                "pipeline_s": round(t_pipe_csv, 2),
                "total_s": round(total_csv, 2),
                "rows_per_s": int(res_csv["rows_clean"] / total_csv),
            },
            "pipeline_only": {
                "total_s": round(t_pipe_mem, 2),
                "rows_per_s": int(res_mem["rows_clean"] / t_pipe_mem),
            },
            "reference": {
                "rows": 12_380_927,
                "read_s": 25.94,
                "pipeline_s": 98.85,
                "total_s": 124.79,
                "rows_per_s": 99_214,
                "hardware": "GCP Dataproc cluster (BASELINE.md)",
            },
            "speedup_total_vs_reference": round(
                124.79 / total_csv, 2
            ),
            "cpus": cpus,
        }
        print(json.dumps(out))
        # PER-ROUND GATE (round-13 verdict #3): this tool is re-run each
        # round and its line committed as ETL_REFSCALE_r{N}.json; a row
        # count drifting off the reference's exact post-clean count means
        # the ETL semantics changed — fail loudly, don't record quietly.
        if out["rows_post_clean"] != out["target_rows_post_clean"]:
            print(
                f"GATE FAIL: rows_post_clean {out['rows_post_clean']} != "
                f"target {out['target_rows_post_clean']}",
                file=sys.stderr,
            )
            return 1
        return 0
    finally:
        if args.workdir is None:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
