#!/usr/bin/env python
"""Reference → engine migration, runnable end to end.

Every step of abcrz/nyc-taxi-etl-pyspark's three entry points mapped to
its engine equivalent (reference file:line cited inline). A user of the
reference switches by replacing each script call with the library call
shown here; semantics are identical (the ETL stage order is preserved
verbatim and differential-tested against DuckDB in
tests/test_etl_pipeline.py) while the engine adds the scale defaults the
reference leaves unset (AQE, skew-join handling, caching the cleaned
frame instead of recomputing it 3x).

Run: python examples/reference_migration.py
(uses a synthesized taxi-shaped frame; the reference's GCS paths are
just argument strings here).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# ── reference: src/utils/spark_builder.py:4-18 (bare builder) ──────────
# engine: session.py adds AQE + skew-join + UTC + sized shuffles
from nyc_taxi_etl_pyspark_spark.session import get_spark

# ── reference: src/pipeline/main_etl.py + etl_writer.py + transformations.py
from nyc_taxi_etl_pyspark_spark.etl import clean_and_transform, run_etl, trips_by_hour

# ── reference: src/models/trainer.py:10-140 / model_loader.py / api/app.py
from nyc_taxi_etl_pyspark_spark.ml.serving import load_model, predict_one
from nyc_taxi_etl_pyspark_spark.ml.trainer import train_gbt_regressor


def synth_taxi_frame(spark, n=200_000):
    """Taxi-shaped input standing in for the raw CSV
    (main_etl.py:47-52 reads gs://.../yellow_tripdata_2015-01.csv; at
    scale the engine reads the same CSV with an EXPLICIT schema to skip
    the inferSchema double scan — sources/io.py::read_csv)."""
    month_s = 31 * 86400
    return spark.range(n).select(
        (F.col("id") % 7 - 1).cast("int").alias("payment_type"),
        F.timestamp_seconds(F.lit(1420070400) + (F.col("id") * 18) % month_s)
        .alias("tpep_pickup_datetime"),
        F.timestamp_seconds(
            F.lit(1420070400) + (F.col("id") * 18) % month_s + (F.col("id") % 200) * 66
        ).alias("tpep_dropoff_datetime"),
        ((F.col("id") % 50).cast("double") / 10.0 - 0.4).alias("trip_distance"),
        ((F.col("id") % 90).cast("double") - 2.0).alias("fare_amount"),
        ((F.col("id") % 95).cast("double") - 1.0).alias("total_amount"),
        (F.col("id") % 8 - 1).cast("int").alias("passenger_count"),
        (F.lit(-74.35) + (F.col("id") % 100).cast("double") / 125.0).alias("pickup_longitude"),
        (F.lit(40.45) + (F.col("id") % 60).cast("double") / 100.0).alias("pickup_latitude"),
        (F.lit(-74.25) + (F.col("id") % 80).cast("double") / 100.0).alias("dropoff_longitude"),
        (F.lit(40.55) + (F.col("id") % 40).cast("double") / 80.0).alias("dropoff_latitude"),
    )


def main() -> None:
    spark = get_spark(app_name="reference-migration")
    spark.sparkContext.setLogLevel("ERROR")
    raw = synth_taxi_frame(spark)

    with tempfile.TemporaryDirectory() as td:
        # ════ entry point 1: python src/pipeline/main_etl.py ════
        # reference: read → clean_and_transform (transformations.py:4-48)
        #   → count (main_etl.py:81) → write_curated (etl_writer.py:4-12)
        #   → write_aggregates (etl_writer.py:15-45, 5% sample)
        # engine: ONE call; cleaned frame cached (the reference re-ran the
        # scan+clean 3x, SURVEY §3.1); aggregates EXACT by default (the
        # 5% pre-sample was a VM-survival hack, SURVEY §4.2).
        counts = run_etl(
            spark, raw, td + "/curated", td + "/agg", agg_target_files=4
        )
        print(f"[etl]   rows_clean={counts['rows_clean']} rows_agg={counts['rows_agg']}")

        # the intermediate stages compose individually too:
        clean = clean_and_transform(spark, raw)
        hourly = trips_by_hour(clean)  # etl_writer.py:24-35 flagship agg
        print(f"[agg]   first hour: {hourly.first()}")

        # ════ entry point 2: python src/pipeline/main_train.py ════
        # reference: trainer.py:10-140 — select/filter/dropna/sample/limit
        #   → StringIndexer → OHE → VectorAssembler → GBT(maxDepth=5,
        #   maxIter=60, stepSize=0.1) → rmse/mae → save
        # engine: same chain + hyperparams as DEFAULTS, any column set.
        model_path = td + "/model"
        result = train_gbt_regressor(
            clean,
            label_col="total_amount",
            numeric_features=[
                "trip_distance", "trip_duration_min", "passenger_count", "pickup_hour",
            ],
            categorical_features=["payment_type"],
            max_iter=10,  # reference default 60; reduced for example latency
            limit=50_000,  # trainer.py:51 row cap
            model_path=model_path,
        )
        print(f"[train] rmse={result.metrics['rmse']:.4f} mae={result.metrics['mae']:.4f}")

        # ════ entry point 3: Flask /predict (api/app.py:25-44) ════
        # reference: load model once at import, one-row DataFrame per
        # request, .first().prediction
        # engine: load_model + predict_one(dict) — same lifecycle.
        model = load_model(model_path)
        pred = predict_one(
            spark,
            model,
            {
                "trip_distance": 2.5,
                "trip_duration_min": 11.0,
                "passenger_count": 1,
                "pickup_hour": 9,
                "payment_type": 1,
            },
        )
        print(f"[serve] prediction_total_amount={round(pred, 2)}")

    spark.stop()


if __name__ == "__main__":
    main()
