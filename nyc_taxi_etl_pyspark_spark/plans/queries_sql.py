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


# TPC-H Q4 shape (order-priority checking), adapted: "has a lineitem
# shipped after the order date" stands in for commit<receipt (fixture has
# no commit/receipt dates). Catalyst decorrelates EXISTS into a left-semi
# join — no per-row subquery execution at any scale.
_SQL_EXISTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_sql_exists_subquery", oracle=_SQL_EXISTS)
def q_sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL entry point (TPC-H Q4 shape).
    Plan check: Catalyst rewrites to a LeftSemi hash join (RewritePredicateSubquery),
    so the subquery costs one join shuffle, not |orders| probes."""
    return run_sql(spark, sf_dir, _SQL_EXISTS)


# TPC-H Q17 shape (small-quantity-order revenue): correlated SCALAR
# aggregate subquery — decorrelated by Catalyst into an aggregate + join
# on l_partkey (one extra shuffle over lineitem, not a per-row loop).
_SQL_SCALAR_SUB = """
SELECT p.p_brand,
       round(sum(l.l_extendedprice) + 1e-9, 4) AS small_qty_revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@query("q_sql_scalar_subquery", oracle=_SQL_SCALAR_SUB)
def q_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery (TPC-H Q17 shape) — the
    per-part average threshold decorrelates to groupBy(l_partkey).avg +
    an equi-join; revenue rolled up per brand for a small stable result."""
    return run_sql(spark, sf_dir, _SQL_SCALAR_SUB)


# TPC-H Q18 shape (large-volume customers): CTE + HAVING feeding a
# 3-way join, deterministic top-20.
_SQL_CTE_TOPN = """
WITH big_orders AS (
  SELECT l_orderkey, round(sum(l_quantity) + 1e-9, 4) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 100
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, b.total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN big_orders b ON b.l_orderkey = o.o_orderkey
ORDER BY b.total_qty DESC, o.o_orderkey
LIMIT 20
"""


@query("q_sql_cte_topn", oracle=_SQL_CTE_TOPN)
def q_sql_cte_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + HAVING + multi-join top-n (TPC-H Q18 shape). The CTE is a
    plain subplan (no materialization barrier); the HAVING-filtered
    aggregate shrinks the build side before the joins, and the final
    ORDER BY ... LIMIT plans as TakeOrderedAndProject."""
    return run_sql(spark, sf_dir, _SQL_CTE_TOPN)
