"""Single-row model inference (SURVEY.md §2.10 M7).

The reference serves predictions from Flask by building a 1-row DataFrame
per HTTP request (``src/api/app.py:33-37``, ``src/webapp/webapp.py:56-68``).
``predict_one`` is that path as a library function: dict in → float out,
with the model held resident (load once at process start, ref
``src/models/model_loader.py:17-42``).
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import Row, SparkSession


def load_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)


def predict_one(
    spark: SparkSession, model: PipelineModel, features: dict
) -> float:
    """Score one feature dict through a fitted PipelineModel."""
    df = spark.createDataFrame([Row(**features)])
    return float(model.transform(df).first()["prediction"])
