#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r15/.

    python tools/capture_plans.py after q_foo q_bar ...
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nyc_taxi_etl_pyspark_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    queries = e.queries()
    os.makedirs("plans/r15", exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r15/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path, len(buf.getvalue()), "bytes", flush=True)


if __name__ == "__main__":
    main()
