from nyc_taxi_etl_pyspark_spark.ml.trainer import TrainResult, train_gbt_regressor
from nyc_taxi_etl_pyspark_spark.ml.export import GBTScorer
from nyc_taxi_etl_pyspark_spark.ml.serving import predict_one

__all__ = ["train_gbt_regressor", "TrainResult", "predict_one", "GBTScorer"]
