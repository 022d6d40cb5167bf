#!/usr/bin/env python
"""Round-15 streaming-family profiler (guide §1: measure first).

Runs the slow streaming queries (the 5 slowest sf1 sweep entries of the
family) one by one at the given sf_dir, capturing

- wall seconds per query, and
- the per-micro-batch ``StreamingQueryProgress`` breakdown (durationMs:
  addBatch / getBatch / latestOffset / queryPlanning / walCommit /
  commitOffsets / triggerExecution, plus stateOperators commit times)
  via a global ``StreamingQueryListener`` — the evidence VERDICT r14
  item 3 asks for: per-batch overhead vs per-batch data work.

foreachBatch-driven queries (semantic_dedup, rate_limited, cdf) also
show up in the listener; their addBatch time contains the foreachBatch
body (the real work), the rest is harness overhead.

Usage: python tools/profile_streaming_r15.py [sf_dir] [out.json] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q_streaming_semantic_dedup",
    "q_streaming_interval_join",
    "q_streaming_sessionize",
    "q_streaming_rate_limited",
    "q_streaming_cdf",
]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/sfscale/sf1"
    out_path = args[1] if len(args) > 1 else "plans/r15/streaming_profile.json"
    names = args[2:] or QUERIES

    from pyspark.sql.streaming import StreamingQueryListener

    from nyc_taxi_etl_pyspark_spark.plans.registry import all_query_specs
    from nyc_taxi_etl_pyspark_spark.session import get_spark

    spark = get_spark("profile_streaming_r15")

    progress: list[dict] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                progress.append(json.loads(event.progress.json))
            except Exception:
                pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_Capture())

    specs = all_query_specs()
    report: dict = {"sf_dir": sf_dir, "queries": {}}
    for name in names:
        spec = specs[name]
        mark = len(progress)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        batches = []
        for p in progress[mark:]:
            d = p.get("durationMs", {})
            row = {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": d,
            }
            ops = p.get("stateOperators") or []
            if ops:
                row["state"] = [
                    {
                        k: o.get(k)
                        for k in (
                            "operatorName",
                            "commitTimeMs",
                            "numRowsTotal",
                            "numRowsUpdated",
                            "numShufflePartitions",
                        )
                    }
                    for o in ops
                ]
            batches.append(row)
        overhead_ms = sum(
            sum(v for k, v in b["durationMs"].items() if k != "addBatch")
            for b in batches
        )
        add_ms = sum(b["durationMs"].get("addBatch", 0) for b in batches)
        report["queries"][name] = {
            "wall_s": round(wall, 2),
            "n_batches": len(batches),
            "addBatch_ms": add_ms,
            "non_addBatch_ms": overhead_ms,
            "batches": batches,
        }
        print(
            f"{name}: {wall:.2f}s, {len(batches)} batches, "
            f"addBatch {add_ms}ms, other {overhead_ms}ms",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
