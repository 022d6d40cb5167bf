"""nyc_taxi_etl_pyspark_spark — a PySpark-native analytics engine.

A clean-room, Spark-first rebuild of the query semantics of the reference
repo abcrz/nyc-taxi-etl-pyspark (NYC taxi batch ETL + ML pipeline), widened
into a general, oracle-tested operator library and extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) needed at 100 TB scale.

Design rules (applied engine-wide):

- Every operator is ``DataFrame -> DataFrame`` — lazy, composable, planned
  by Catalyst. No driver-side materialization inside operators.
- Built-in ``pyspark.sql.functions`` everywhere; Pandas UDFs only where the
  built-ins genuinely cannot express the semantics (multimodal decode).
- AQE on, explicit schemas on ingest, broadcast hints on dimension joins,
  configurable partitioning instead of hardcoded literals.
"""

from nyc_taxi_etl_pyspark_spark.session import get_spark, ensure_session_conf

__all__ = ["get_spark", "ensure_session_conf"]
__version__ = "0.1.0"
