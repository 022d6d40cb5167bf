"""Set-operation queries (SURVEY.md §2.7 — absent in reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_union",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'high' AS price_band
    FROM orders WHERE o_totalprice > 150000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'low' AS price_band
    FROM orders WHERE o_totalprice < 5000
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two labeled slices (UNION ALL semantics — Spark
    ``union`` never dedups; dedup is an explicit ``distinct``)."""
    o = load_table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 150000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("price_band")
    )
    low = o.filter(F.col("o_totalprice") < 5000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("price_band")
    )
    return high.unionByName(low)


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both a finished order and a
    big order."""
    o = load_table(spark, sf_dir, "orders")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return finished.intersect(big)


@query(
    "q_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference) via ``exceptAll``."""
    o = load_table(spark, sf_dir, "orders")
    all_keys = o.select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_keys.exceptAll(finished)


@query(
    "q_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash-aggregate without aggregates)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()
