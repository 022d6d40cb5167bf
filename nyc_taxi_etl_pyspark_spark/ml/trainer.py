"""ML training pipeline (SURVEY.md §2.10) — the reference's estimator
chain (``src/models/trainer.py``), generalized.

Chain parity with the reference:
  StringIndexer(handleInvalid="keep") → OneHotEncoder → VectorAssembler →
  GBTRegressor(maxDepth=5, maxIter=60, stepSize=0.1) → fit/transform →
  RegressionEvaluator(rmse, mae) → save/load
(reference call sites: trainer.py:69-73, 75-78, 80-89, 91-97, 99-111,
113-127, 132-138). Columns, label, sample/limit caps, and GBT params are
arguments instead of hardcoded; defaults replicate the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame


@dataclass
class TrainResult:
    model: PipelineModel
    metrics: dict[str, float]
    predictions: DataFrame = field(repr=False)


def train_gbt_regressor(
    df: DataFrame,
    label_col: str,
    numeric_features: list[str],
    categorical_features: list[str] | None = None,
    max_depth: int = 5,
    max_iter: int = 60,
    step_size: float = 0.1,
    sample_fraction: float | None = None,
    limit: int | None = None,
    split: tuple[float, float] = (0.8, 0.2),
    seed: int = 42,
    model_path: str | None = None,
) -> TrainResult:
    """Train/evaluate the reference's GBT regression pipeline on any
    (label, numeric, categorical) column selection.

    Mirrors the reference's data prep: column pruning (trainer.py:22-30),
    dropna (:40), optional seeded sample (:50) and row cap (:51), then the
    seeded 80/20 randomSplit (:62)."""
    categorical_features = categorical_features or []
    cols = [label_col, *numeric_features, *categorical_features]
    prepared = df.select(*cols).dropna()
    if sample_fraction is not None:
        prepared = prepared.sample(False, sample_fraction, seed=seed)
    if limit is not None:
        prepared = prepared.limit(limit)

    train_df, test_df = prepared.randomSplit(list(split), seed=seed)

    stages = []
    ohe_cols = []
    for c in categorical_features:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        )
        stages.append(OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_ohe"))
        ohe_cols.append(f"{c}_ohe")
    stages.append(
        VectorAssembler(inputCols=[*numeric_features, *ohe_cols], outputCol="features")
    )
    stages.append(
        GBTRegressor(
            featuresCol="features",
            labelCol=label_col,
            maxDepth=max_depth,
            maxIter=max_iter,
            stepSize=step_size,
            seed=seed,
        )
    )

    model = Pipeline(stages=stages).fit(train_df)
    predictions = model.transform(test_df)

    metrics = {}
    for metric in ("rmse", "mae"):
        evaluator = RegressionEvaluator(
            labelCol=label_col, predictionCol="prediction", metricName=metric
        )
        metrics[metric] = float(evaluator.evaluate(predictions))

    if model_path is not None:
        model.write().overwrite().save(model_path)

    return TrainResult(model=model, metrics=metrics, predictions=predictions)
