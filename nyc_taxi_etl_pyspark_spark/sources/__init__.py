from nyc_taxi_etl_pyspark_spark.sources.io import (
    read_csv,
    read_parquet,
    write_parquet_partitioned,
)
from nyc_taxi_etl_pyspark_spark.sources.tables import TABLES, load_table
from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

__all__ = [
    "read_csv",
    "read_parquet",
    "write_parquet_partitioned",
    "load_table",
    "TABLES",
    "TransactionalTable",
]
