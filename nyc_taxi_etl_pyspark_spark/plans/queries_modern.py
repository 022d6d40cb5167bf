"""Modern Spark-4 surface (SURVEY.md §2 extension): VARIANT
semi-structured type, DataFrame UNPIVOT, error-safe ``try_*`` arithmetic,
null-safe join equality, SQL LATERAL subquery, and the custom Python
DataSource scan.

None of these exist in the reference (whose whole expression surface is
Spark-3.5 built-ins, SURVEY §2.8); they are the API generations a user
migrating onto this engine gets for free by being Spark-4-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.queries_sql import run_sql
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.session import default_parallelism
from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the VARIANT type (Spark 4):
    ``parse_json`` parses the string ONCE into a binary-encoded variant,
    ``variant_get`` then navigates paths without re-parsing — the scale
    answer to q_json_extract's per-path ``get_json_object`` re-parse when
    a pipeline extracts many fields from one payload. Same oracle as
    q_json_extract: the type changes the execution, not the semantics."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("prop_k"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the fact measures (the inverse of q_pivot) via
    the native UNPIVOT operator — one Expand node, ONE scan, where the
    UNION-ALL spelling (the oracle) scans the table once per measure.
    The long shape is what generic profilers / metric stores consume;
    output is |rows|×|measures| but produced without any shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "q_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_extendedprice / l_discount + 1e-9, 4)
           END AS price_per_discount,
           TRY_CAST(l_returnflag AS INT) AS flag_as_int
    FROM lineitem
    """,
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: ``try_divide`` yields NULL on divide-by-zero
    and ``try_cast`` NULL on malformed input instead of failing the job
    under ANSI mode (Spark 4's default). On a 100 TB corpus a handful of
    bad rows must degrade to NULLs a quality filter can count — not kill
    a six-hour job at 99%. The oracle spells the same semantics as
    explicit CASE/TRY_CAST."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        stable_round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 4
        ).alias("price_per_discount"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
      SELECT event_id,
             CASE WHEN value < 50 THEN NULL
                  ELSE CAST(floor(value / 100) AS BIGINT) END AS bucket
      FROM events WHERE event_id % 97 = 0
    ), b AS (
      SELECT event_id,
             CASE WHEN value < 50 THEN NULL
                  ELSE CAST(floor(value / 100) AS BIGINT) END AS bucket
      FROM events WHERE event_id % 89 = 0
    )
    SELECT a.bucket, count(*) AS n_pairs
    FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
    GROUP BY a.bucket
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics entity
    resolution needs when "unknown" is itself a matchable state. Catalyst
    plans ``<=>`` as a hash join key exactly like ``=`` (NULL hashes to a
    regular bucket), so this costs the same as a plain equi-join — but a
    NULL-heavy key is the degenerate hot key, so the same skew remedies
    (q_skew_profile → salting) apply at scale."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.when(F.col("value") < 50, F.lit(None).cast("bigint")).otherwise(
        F.floor(F.col("value") / 100).cast("bigint")
    )
    a = ev.where(F.col("event_id") % 97 == 0).select(
        "event_id", bucket.alias("bucket")
    )
    b = ev.where(F.col("event_id") % 89 == 0).select(
        "event_id", bucket.alias("bucket")
    )
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.bucket").eqNullSafe(F.col("b.bucket")))
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.count("*").alias("n_pairs"))
    )


_SQL_LATERAL = """
SELECT n.n_name AS nation_name, t.custkey, t.acctbal
FROM nation n, LATERAL (
  SELECT c_custkey AS custkey, c_acctbal AS acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


@query("q_sql_lateral_topn", oracle=_SQL_LATERAL)
def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — top-2
    customers per nation written as "for each nation, run this subquery",
    the SQL-standard spelling of top-k-per-group (DataFrame form:
    q_window_topk_per_group). One portable ANSI string runs verbatim on
    Spark and DuckDB; Catalyst decorrelates the lateral into a
    window/limit over a single join rather than |nation| subquery runs."""
    return run_sql(spark, sf_dir, _SQL_LATERAL)


@query(
    "q_scan_pyds",
    oracle="""
    SELECT CAST(i AS BIGINT) AS id,
           md5(CAST(i AS VARCHAR)) AS doc
    FROM generate_series(0, 9999) AS t(i)
    """,
)
def q_scan_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through the engine's custom Python DataSource
    (sources/pyds.py, Spark 4 ``pyspark.sql.datasource`` API): the source
    declares its schema and partition split, executors run
    ``read(partition)`` in parallel — the extension point for systems
    Spark has no built-in connector for, with the read parallelized and
    task-retried like any native scan. Deterministic (id, md5) output
    keeps even the custom-connector path oracle-verified."""
    register_python_sources(spark)
    return (
        spark.read.format("rangedoc")
        .option("n", 10000)
        .option("partitions", default_parallelism())
        .load()
    )


@query(
    "q_streaming_pyds",
    oracle="""
    SELECT CAST(i AS BIGINT) AS id,
           md5(CAST(i AS VARCHAR)) AS doc
    FROM generate_series(0, 1999) AS t(i)
    """,
)
def q_streaming_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python DataSource as a STREAMING source: the same
    (id, md5) generator read through ``spark.readStream`` in 250-row
    micro-batches, offsets checkpointed by the engine, replay via
    ``readBetweenOffsets`` re-deriving any committed slice (pure function
    of the offset — the replayability contract). FULL ORACLE (round 4):
    the generator is a pure function of the row id, and exactly-once
    offset accounting means the drained sink must hash-equal the same
    2000-row derivation DuckDB states declaratively — the oracle checks
    the offset bookkeeping, not just the generator. Batch/stream parity
    is also asserted in tests/test_scale_techniques.py."""
    register_python_sources(spark)
    stream = (
        spark.readStream.format("rangedoc")
        .option("n", 2000)
        .option("batchsize", 250)
        .load()
    )
    name = "pyds_stream_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
