"""ML queries (SURVEY.md §2.10) — rows-only: estimator fitting is not
SQL-expressible and not deterministic across engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.ml.trainer import train_gbt_regressor
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query("q_ml_train_predict", oracle=None)  # estimator fit => rows-only
def q_ml_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the reference-shaped GBT pipeline (StringIndexer → OHE →
    VectorAssembler → GBT) on lineitem: predict l_extendedprice from
    quantity/discount/tax + categorical returnflag. maxIter is reduced
    60 → 10 for driver latency; hyperparameter parity with the reference
    (maxDepth=5, maxIter=60, stepSize=0.1) is exercised via defaults in
    ``ml/trainer.py``. Returns holdout predictions with finite error."""
    li = load_table(spark, sf_dir, "lineitem")
    result = train_gbt_regressor(
        li,
        label_col="l_extendedprice",
        numeric_features=["l_quantity", "l_discount", "l_tax"],
        categorical_features=["l_returnflag"],
        max_iter=10,
        limit=50_000,
    )
    return result.predictions.select(
        "l_quantity",
        "l_returnflag",
        F.col("l_extendedprice").alias("label"),
        F.round("prediction", 4).alias("prediction"),
    )
