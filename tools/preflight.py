"""Pre-flight gate: run EVERY registered query — and its DuckDB oracle
where one exists — on a VANILLA SparkSession at a given scale factor,
and write ``PREFLIGHT_r{N}.json`` with per-query pass/fail + wall time.

This is the committed, re-runnable form of the closing-gate routine the
round-8 verdict asked for ("What's missing #5"): the external driver
only samples the first 50 registry keys, so rotation of that window
(``plans/registry.py::_ATTESTATION_FRONT``) is honest ONLY if the full
registry is re-checked from the tree each round. This tool is that
check.

Vanilla session = ``SparkSession.builder.master(...)`` with NO engine
confs — the driver builds its own session, so engine-required settings
(UTC, nanos-as-long) must be applied lazily by the engine itself
(``sources/tables.ensure_session_conf``); running with a pre-configured
test fixture would mask a missing lazy conf.

Usage::

    python tools/preflight.py [--sf-dir /root/testdata/sf0.01]
                              [--out PREFLIGHT_r9.json]
                              [--only q_a,q_b] [--cpus 8]

Exit code 0 iff every query constructs, executes, and (when an oracle
exists) matches under the driver's row-count + schema-kind +
order-insensitive value comparison (``tests/oracle_harness``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # vanilla: no engine confs — exactly the driver's session shape
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("preflight")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from oracle_harness import compare, run_oracle

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    from nyc_taxi_etl_pyspark_spark.plans.registry import all_query_specs

    tiers = {n: s.tier for n, s in all_query_specs().items()}

    results: dict[str, dict] = {}
    failures = 0
    t_start = time.perf_counter()
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        rec: dict = {"oracle": name in oracles}
        if tiers.get(name, "production") != "production":
            rec["tier"] = tiers[name]
        try:
            df = qs[name](spark, args.sf_dir)
            if name in oracles:
                problems = compare(df, run_oracle(args.sf_dir, oracles[name]), name)
                rec["status"] = "pass" if not problems else "fail"
                if problems:
                    rec["problems"] = problems
            else:
                rec["rows"] = df.count()
                rec["status"] = "rows_only"
        except Exception:
            rec["status"] = "error"
            rec["problems"] = [traceback.format_exc(limit=8)]
        rec["wall_s"] = round(time.perf_counter() - t0, 3)
        results[name] = rec
        if rec["status"] in ("fail", "error"):
            failures += 1
            print(f"[{i + 1}/{len(names)}] {name}: {rec['status'].upper()}")
            for p in rec.get("problems", []):
                print("   ", p.strip().splitlines()[-1])
        elif (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(names)}] ... {name} {rec['status']}")

    total = round(time.perf_counter() - t_start, 1)
    summary = {
        "sf_dir": args.sf_dir,
        "n_queries": len(names),
        "n_oracle_checked": sum(1 for r in results.values() if r["oracle"]),
        "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
        "n_failures": failures,
        "total_wall_s": total,
        # tier census (round 15): the non-production tiers, by tag —
        # bounded-by-design demo/oracle formulations that stay
        # registered and checked here but are skipped by scale_sweep
        "tiers": {
            t: sorted(n for n, tt in tiers.items() if tt == t)
            for t in ("demo", "oracle")
            if any(tt == t for tt in tiers.values())
        },
        "queries": results,
    }
    out = args.out or os.path.join(REPO, "PREFLIGHT.json")
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(
        f"preflight: {len(names)} queries, "
        f"{summary['n_oracle_checked']} oracle-checked, "
        f"{failures} failures, {total}s -> {out}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
