# %% [markdown]
# # ETL + model-training walkthrough (the reference notebooks, engine edition)
#
# The reference ships two interactive notebooks —
# `src/notebooks/etl.ipynb` (read → explore → clean → cache → count →
# partitioned write → hourly aggregate) and
# `src/notebooks/train_model.ipynb` (feature pipeline → GBT fit →
# RMSE eval → save → reload → single-row predict) — that its scripts
# then productionize. This file is their engine analog in jupytext
# PERCENT format: open it in Jupyter/JupyterLab/VS Code and it renders
# and runs as a notebook, cell by cell, or run it top-to-bottom as a
# plain script (`python examples/etl_walkthrough.py`).
#
# Every cell cites the reference notebook cell it mirrors; the engine
# calls are the same ones `examples/reference_migration.py` maps
# one-to-one from the reference's scripts.

# %%
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.session import get_spark

spark = get_spark(app_name="etl-walkthrough")
work = tempfile.mkdtemp(prefix="etl_walkthrough_")

# %% [markdown]
# ## 1. Load raw trips (etl.ipynb: read cell)
# The reference reads CSV with header + inferSchema from GCS; here we
# synthesize the same taxi-shaped frame the bench/migration example
# uses so the walkthrough is self-contained and deterministic.

# %%
from examples.reference_migration import synth_taxi_frame

raw = synth_taxi_frame(spark, n=200_000)
raw.printSchema()
print("raw rows:", raw.count())

# %% [markdown]
# ## 2. Explore (etl.ipynb: display/describe cells)
# The notebook eyeballs ranges before choosing the quality gates; the
# engine's `q_column_profile` / `q_data_quality_audit` queries are the
# productionized versions of this cell.

# %%
raw.select("fare_amount", "trip_distance", "passenger_count").summary(
    "min", "25%", "50%", "75%", "max"
).show()

# %% [markdown]
# ## 3. Clean + transform (etl.ipynb: cleaning cells; src/features/transformations.py)
# One call: bbox + quality gates, payment-type broadcast lookup,
# date/hour/dow derivations — stage order preserved verbatim from the
# reference (differential-tested in tests/test_etl_pipeline.py).

# %%
from nyc_taxi_etl_pyspark_spark.etl import clean_and_transform, trips_by_hour

clean = clean_and_transform(spark, raw).cache()  # notebook's df_clean.cache()
print("post-clean rows:", clean.count())

# %% [markdown]
# ## 4. Write curated + hourly rollup (etl.ipynb: write cells)

# %%
clean.repartition("pickup_date").write.mode("overwrite").partitionBy(
    "pickup_date"
).parquet(f"{work}/curated")
hourly = trips_by_hour(clean)
hourly.coalesce(4).write.mode("overwrite").parquet(f"{work}/hourly")
hourly.orderBy("pickup_hour").show(5)

# %% [markdown]
# ## 5. Train the fare model (train_model.ipynb: pipeline + fit cells)
# Indexer → one-hot → assembler → GBT, the reference's exact stage
# list; returns the fitted pipeline plus the held-out RMSE.

# %%
from nyc_taxi_etl_pyspark_spark.ml.trainer import train_gbt_regressor

model_path = f"{work}/model"
result = train_gbt_regressor(
    clean,
    label_col="total_amount",
    numeric_features=[
        "trip_distance",
        "trip_duration_min",
        "passenger_count",
        "pickup_hour",
    ],
    categorical_features=["payment_type"],
    max_iter=10,  # reference default 60; reduced for walkthrough latency
    limit=50_000,  # trainer.py:51 row cap
    model_path=model_path,
)
print("holdout rmse:", round(result.metrics["rmse"], 4),
      "mae:", round(result.metrics["mae"], 4))

# %% [markdown]
# ## 6. Reload + single-row predict (train_model.ipynb: save/load cells; api/app.py)

# %%
from nyc_taxi_etl_pyspark_spark.ml.serving import load_model, predict_one

served = load_model(model_path)
fare = predict_one(
    spark,
    served,
    {
        "trip_distance": 2.5,
        "trip_duration_min": 11.0,
        "passenger_count": 1,
        "pickup_hour": 9,
        "payment_type": 1,
    },
)
print("predicted total_amount:", round(fare, 2))

# %%
import shutil

shutil.rmtree(work, ignore_errors=True)
print("walkthrough complete")
