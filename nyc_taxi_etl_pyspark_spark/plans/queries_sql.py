"""SQL-string entry point (SURVEY.md §2.8/§3 extension).

The reference's only SQL surface is a filter string
(``transformations.py:17``); this module gives the engine a full
``spark.sql`` entry point: fixture tables registered as temp views, and
queries written ONCE in engine-portable ANSI SQL that runs VERBATIM on
both Spark and the DuckDB oracle — zero translation, so the oracle string
IS the Spark query. The portability rules are the registry's usual hash
rules (identical aliases, ``round(x + 1e-9, 4)`` on float reductions,
deterministic total order on any LIMIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view for ``spark.sql``."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """The engine's SQL entry point: views + one Catalyst-parsed query."""
    register_views(spark, sf_dir)
    return spark.sql(sql)


# TPC-H Q3-shaped (shipping priority), adapted to the fixture schema
# (o_orderpriority instead of o_shippriority; timestamp columns).
_SQL_PRICING = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q_sql_pricing_topk", oracle=_SQL_PRICING)
def q_sql_pricing_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the raw SQL entry point — the SAME string
    is the Spark query and the DuckDB oracle (portable ANSI subset).
    Catalyst still gets the full declarative plan: join reordering,
    selective-dim pushdown, partial aggregation, top-k sort."""
    return run_sql(spark, sf_dir, _SQL_PRICING)
