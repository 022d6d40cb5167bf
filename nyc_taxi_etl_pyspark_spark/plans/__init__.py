from nyc_taxi_etl_pyspark_spark.plans.registry import (
    QuerySpec,
    all_queries,
    all_oracle_sql,
    get_query,
    query,
)

__all__ = ["QuerySpec", "query", "all_queries", "all_oracle_sql", "get_query"]
