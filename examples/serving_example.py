#!/usr/bin/env python
"""Online inference end to end: train → save → load → serve → request.

The reference's third entry point (SURVEY.md §3.3) is a Flask app that
loads a PipelineModel from storage once at startup and scores a 1-row
DataFrame per HTTP request (``src/api/app.py``, ``src/webapp/webapp.py``,
``src/models/model_loader.py``). This example closes that path with the
engine: the same contract (POST /predict, JSON features in, validated +
coerced, ``{"prediction": round(x, 2)}`` out, 400/500 on bad input /
scoring failure) served by ``ml/serving.py::ModelServer`` on the stdlib
http.server — no Flask, no new dependencies.

Run: python examples/serving_example.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_etl_pyspark_spark.ml.serving import ModelServer, load_model
from nyc_taxi_etl_pyspark_spark.ml.trainer import train_gbt_regressor
from nyc_taxi_etl_pyspark_spark.session import get_spark
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# The reference's REQUIRED_FIELDS validation map (api/app.py:10-16),
# retargeted to the fixture's order-features model.
REQUIRED_FIELDS = {
    "o_totalprice_rank": float,
    "n_items": int,
    "o_custkey": int,
}


def main() -> None:
    spark = get_spark(app_name="serving-example")

    # ── train a small model on fixture orders (reference main_train.py) ──
    orders = load_table(spark, SF_DIR, "orders")
    from pyspark.sql import functions as F

    feats = orders.select(
        F.col("o_totalprice").alias("label_price"),
        (F.col("o_totalprice") / 1000.0).alias("o_totalprice_rank"),
        (F.col("o_orderkey") % 7).cast("int").alias("n_items"),
        F.col("o_custkey").cast("int"),
    )
    result = train_gbt_regressor(
        feats,
        label_col="label_price",
        numeric_features=["o_totalprice_rank", "n_items", "o_custkey"],
        max_iter=5,  # serving demo, not model quality
    )
    print("holdout metrics:", {k: round(v, 4) for k, v in result.metrics.items()})

    # ── save + load (reference trainer.py:132-138 / model_loader.py:38) ──
    with tempfile.TemporaryDirectory() as tmp:
        model_path = os.path.join(tmp, "model")
        result.model.write().overwrite().save(model_path)
        model = load_model(model_path)  # the process-start load

        # ── serve + request (reference api/app.py) ─────────────────────
        with ModelServer(spark, model, REQUIRED_FIELDS) as srv:
            host, port = srv.addr
            url = f"http://{host}:{port}/predict"

            good = {"o_totalprice_rank": 42.5, "n_items": 3, "o_custkey": 17}
            req = urllib.request.Request(
                url,
                data=json.dumps(good).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                print("POST /predict", good, "->", json.load(resp))

            bad = {"o_totalprice_rank": "not-a-number"}
            req = urllib.request.Request(url, data=json.dumps(bad).encode())
            try:
                urllib.request.urlopen(req)
            except urllib.error.HTTPError as e:
                print("POST /predict", bad, "->", e.code, json.load(e))

    spark.stop()


if __name__ == "__main__":
    main()
