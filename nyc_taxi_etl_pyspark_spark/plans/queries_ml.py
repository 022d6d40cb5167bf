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


@query(
    "q_grouped_ols_pandas",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 4) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_grouped_ols_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit via batch ``applyInPandas`` (grouped-map Pandas
    UDF) — the engine's escape hatch for per-group model fitting that
    is NOT expressible as moment aggregates (here it IS, which is what
    makes it oracle-checkable against ``regr_slope``/``regr_intercept``;
    the native spelling is q_agg_regression). Each group arrives as ONE
    Arrow-backed pandas DataFrame: fine for bounded per-group sizes
    (states, shards, model segments) — for groups that can exceed
    executor memory, pre-aggregate the sufficient statistics (moments)
    instead, as the native path does. Slope/intercept computed from the
    same covariance/variance closed form both engines use."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_quantity"].astype("float64")
        y = pdf["l_extendedprice"].astype("float64")
        n = len(pdf)
        mx, my = x.mean(), y.mean()
        cov = ((x - mx) * (y - my)).sum()
        var = ((x - mx) ** 2).sum()
        slope = cov / var
        intercept = my - slope * mx
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "slope": [round(slope + 1e-9, 4)],
                "intercept": [round(intercept + 1e-9, 4)],
                "n": [n],
            }
        )

    return li.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        fit,
        schema="l_returnflag string, l_linestatus string, "
        "slope double, intercept double, n bigint",
    )


@query(
    "q_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_discount * l_quantity) / sum(l_quantity) + 1e-9, 4)
             AS wavg_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean via a GROUPED_AGG ``pandas_udf`` (Series → scalar) —
    the vectorized custom-aggregate surface (UDAF): each group's columns
    arrive as Arrow-backed Series, the reduction runs in numpy at C
    speed. Unlike applyInPandas, a grouped-agg UDF composes inside a
    normal ``groupBy().agg(...)`` alongside built-ins. The oracle states
    the same reduction in plain SQL — custom aggregation is semantically
    invisible. At 100 TB prefer the pure-SQL spelling (partial-agg
    pushdown: sum(w*x)/sum(w) map-side combines; a pandas UDAF ships
    whole groups), reserving this surface for genuinely non-SQL
    reductions."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType spelled explicitly: the module uses
    # `from __future__ import annotations`, so Series→scalar type-hint
    # inference can't see the locally-imported pandas.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wavg(v, w):
        return float((v * w).sum() / w.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg(F.col("l_discount"), F.col("l_quantity")) + F.lit(1e-9), 4).alias(
            "wavg_discount"
        )
    )


@query("q_ml_kmeans_embeddings", oracle=None)  # iterative fit => rows-only
def q_ml_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering over the embedding column via ``pyspark.ml``
    (seeded, k=8): array<float> → ml Vector (array_to_vector — Arrow
    path, no Python loop) → Lloyd iterations → per-cluster size + mean
    intra-cluster squared distance. The fitted centroids are exactly the
    IVF codebook q_ann_ivf hand-rolls with aggregates — this is the
    estimator-API spelling. Each Lloyd iteration is one broadcast of k
    centroids + one map-side partial aggregate (the same shape that
    scales to a 100 TB embedding table; iterations are the serial
    factor, not data volume). Seeded ⇒ stable across runs on one engine;
    rows-only because no SQL engine replicates Lloyd's trajectory."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("vec"),
        array_to_vector(F.col("embedding")).alias("features"),
    )
    model = KMeans(k=8, seed=42, maxIter=5).fit(emb)
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster_id int, center array<double>",
    )
    pred = model.transform(emb).select(
        F.col("prediction").cast("int").alias("cluster_id"), "vec"
    )
    sq_dist = F.aggregate(
        F.zip_with("vec", "center", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        pred.join(F.broadcast(centers), "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg(sq_dist), 4).alias("mean_sq_dist"),
        )
        .orderBy("cluster_id")
    )


@query("q_ml_cv_select", oracle=None)  # CV model selection => rows-only
def q_ml_cv_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperparameter selection with ``CrossValidator`` (3-fold,
    regParam grid over a linear model): the reference trains ONE fixed
    hyperparameter set (trainer.py:91-97); a real pipeline searches.
    Each (fold, param) cell is an independent Spark job over a cached
    fold split — on a cluster, ``parallelism=2`` overlaps cell fits.
    Returns the grid's mean-RMSE-per-param table (the CV summary a
    training run logs), with the chosen regParam flagged."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    ).limit(20_000)
    assembled = VectorAssembler(
        inputCols=["l_quantity", "l_discount", "l_tax"], outputCol="features"
    ).transform(li)
    lr = LinearRegression(labelCol="l_extendedprice", featuresCol="features")
    grid = (
        ParamGridBuilder().addGrid(lr.regParam, [0.0, 0.1, 1.0]).build()
    )
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(
            labelCol="l_extendedprice", metricName="rmse"
        ),
        numFolds=3,
        parallelism=2,
        seed=42,
    )
    model = cv.fit(assembled)
    rows = [
        (float(pm[lr.regParam]), float(m), bool(i == model.avgMetrics.index(min(model.avgMetrics))))
        for i, (pm, m) in enumerate(zip(grid, model.avgMetrics))
    ]
    return spark.createDataFrame(
        rows, "reg_param double, mean_rmse double, chosen boolean"
    ).select("reg_param", F.round("mean_rmse", 4).alias("mean_rmse"), "chosen")
