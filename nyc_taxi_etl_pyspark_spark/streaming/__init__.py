from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
    hourly_agg_exprs,
    run_streaming_tumbling_agg,
    streaming_tumbling_agg,
)

__all__ = ["hourly_agg_exprs", "streaming_tumbling_agg", "run_streaming_tumbling_agg"]
