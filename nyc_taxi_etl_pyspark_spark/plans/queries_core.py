"""Scan / projection / filter / scalar-function queries (SURVEY.md §2.1,
§2.2, §2.8).

Each query re-expresses a reference call site (cited per function) against
the driver fixture tables, with a DuckDB oracle. Per-row expressions are
IEEE-deterministic across engines, so only multi-row reductions are
rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.paths import normalize_uri
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_scan_parquet",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan (reference: ``src/pipeline/main_train.py:46``)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "q_project",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning via explicit select (ref ``src/models/trainer.py:22-30``)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_cast_epoch",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch_s
    FROM events
    """,
)
def q_cast_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → epoch-seconds cast (ref ``src/features/transformations.py:13-14``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", F.col("ts").cast("long").alias("ts_epoch_s"))


@query(
    "q_derive_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def q_derive_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic columns (ref ``transformations.py:11-15`` duration calc).

    Per-row double arithmetic is bit-identical across engines when the
    expression tree is identical, so no rounding is needed here.
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charged"),
    )


@query(
    "q_derive_ratio",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / l_quantity AS unit_price
    FROM lineitem
    """,
)
def q_derive_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived ratio column (ref ``transformations.py:35-38`` avg_speed_kmh)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


@query(
    "q_filter_sqlstring",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 10 AND l_discount > 0.02 AND l_extendedprice > 1000
    """,
)
def q_filter_sqlstring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string conjunctive filter (ref ``transformations.py:17``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        "l_quantity > 10 AND l_discount > 0.02 AND l_extendedprice > 1000"
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")


@query(
    "q_filter_between",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders WHERE o_totalprice BETWEEN 1000 AND 50000
    """,
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN range filter (ref ``transformations.py:18,38``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice").between(1000, 50000)).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "q_filter_bbox",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 5 AND l_quantity < 45
      AND l_discount >= 0.01 AND l_discount <= 0.08
      AND l_tax > 0.0 AND l_tax < 0.07
      AND l_extendedprice > 500 AND l_extendedprice < 80000
    """,
)
def q_filter_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-expression conjunctive range filter — the bounding-box /
    quality-filter shape (ref ``transformations.py:20-29``,
    ``trainer.py:35-39``: 8 ``&``-conjoined comparisons)."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity") > 5)
        & (F.col("l_quantity") < 45)
        & (F.col("l_discount") >= 0.01)
        & (F.col("l_discount") <= 0.08)
        & (F.col("l_tax") > 0.0)
        & (F.col("l_tax") < 0.07)
        & (F.col("l_extendedprice") > 500)
        & (F.col("l_extendedprice") < 80000)
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    )


@query(
    "q_dropna",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
      AND o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
    """,
)
def q_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropna over a column subset (ref ``src/models/trainer.py:40``)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    return o.dropna()


@query(
    "q_date_parts",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
           CAST(EXTRACT(hour FROM o_orderdate) AS INT) AS order_hour
    FROM orders
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part derivations (ref ``transformations.py:31-33``: to_date,
    hour, day-of-week).

    Spark ``dayofweek`` is 1=Sunday..7=Saturday; DuckDB ``dayofweek`` is
    0=Sunday..6=Saturday, hence the ``+1`` on the oracle side. The
    reference's locale-dependent ``date_format(ts, 'E')`` is deliberately
    re-expressed numerically for cross-engine determinism.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.hour("o_orderdate").alias("order_hour"),
    )


@query(
    "q_math_round",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * l_discount + 1e-9, 2) AS discount_amt,
           round(sqrt(l_extendedprice) + 1e-9, 4) AS price_sqrt,
           abs(l_quantity - 25.0) AS qty_dev
    FROM lineitem
    """,
)
def q_math_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (ref ``src/api/app.py:40`` round; widened with
    sqrt/abs). Spark ROUND is HALF_UP and DuckDB rounds half away from
    zero — identical for the positive domain here."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        stable_round(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("discount_amt"),
        stable_round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           CAST(length(c_name) AS INT) AS name_len,
           substring(c_name, 1, 8) AS name_prefix,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           upper(c_mktsegment) AS seg_upper,
           trim(c_name) AS name_trim,
           replace(c_name, '#', '-') AS name_repl
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (absent in reference; SURVEY §2.8 extension)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim("c_name").alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_repl"),
    )


@query(
    "q_like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_name LIKE '%widget%' AND p_type LIKE 'ECO%'
    """,
)
def q_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-pattern filter (SURVEY §2.8 extension, TPC-H Q16 shape)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%") & F.col("p_type").like("ECO%")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (fixture ``events.props``
    is a JSON *string* — parse, don't assume MapType; SURVEY §2.12)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions over ``embeddings.embedding`` (size /
    element_at; SURVEY §2.12 multimodal columns). float32 → double casts
    are exact in both engines, so values hash identically unrounded."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
    )


@query(
    "q_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary-column metadata path (SURVEY §2.12 multimodal): cast a
    payload to ``binary`` and compute typed metadata (byte length, content
    digest) engine-side. The decode step for real image/audio payloads
    lives in ``operators/multimodal.py`` behind a Pandas-UDF stub."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


@query(
    "q_etl_pipeline",
    oracle="""
    WITH dim(event_type, type_desc) AS (
      VALUES ('click', 'Click'), ('view', 'View'), ('purchase', 'Purchase'),
             ('signup', 'Signup'), ('error', 'Error')
    ), clean AS (
      SELECT strftime(ts, '%Y-%m-%d') AS event_date,
             CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour,
             coalesce(type_desc, 'Other') AS type_desc,
             value
      FROM events LEFT JOIN dim USING (event_type)
      WHERE value > 0 AND value <= 400
    )
    SELECT event_date, event_hour, type_desc,
           count(*) AS total_events,
           round(avg(value) + 1e-9, 4) AS avg_value
    FROM clean
    GROUP BY 1, 2, 3
    """,
)
def q_etl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL pipeline shape in one plan (SURVEY §3.1 /
    §7 slice 6) retargeted to ``events``: quality filter → date-part
    derivations → broadcast literal-dim lookup join → multi-key hourly
    aggregate. One linear Catalyst plan: Filter and pruning reach the
    scan, the 5-row dim broadcasts, the agg is partial+final. The
    taxi-shaped original (exact reference column names/bounds) lives in
    ``nyc_taxi_etl_pyspark_spark/etl.py`` with a differential test."""
    ev = load_table(spark, sf_dir, "events")
    dim = F.broadcast(
        spark.createDataFrame(
            [
                ("click", "Click"),
                ("view", "View"),
                ("purchase", "Purchase"),
                ("signup", "Signup"),
                ("error", "Error"),
            ],
            schema="event_type string, type_desc string",
        )
    )
    clean = (
        ev.filter((F.col("value") > 0) & (F.col("value") <= 400))
        .join(dim, on="event_type", how="left")
        .withColumn("type_desc", F.coalesce("type_desc", F.lit("Other")))
        .withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("event_hour", F.hour("ts"))
    )
    return clean.groupBy("event_date", "event_hour", "type_desc").agg(
        F.count("*").alias("total_events"),
        stable_round(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "q_scan_csv",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with EXPLICIT schema (ref ``main_etl.py:47-52`` used
    inferSchema=true — a second full pass over the data, unacceptable at
    100 TB; SURVEY §2.1 S1). The fixture is parquet, so the region table
    is round-tripped through a CSV sink once per session and read back —
    values must hash-match the parquet-backed oracle exactly, proving the
    CSV codec path (quoting, header, schema binding) end-to-end."""
    import os
    import tempfile

    from nyc_taxi_etl_pyspark_spark.sources.io import read_csv

    key = spark.sparkContext.applicationId + normalize_uri(sf_dir)
    csv_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_csv_{abs(hash(key))}"
    )
    if not os.path.isdir(csv_dir):
        load_table(spark, sf_dir, "region").coalesce(1).write.mode(
            "overwrite"
        ).option("header", "true").csv(csv_dir)
    return read_csv(
        spark,
        csv_dir,
        schema="r_regionkey int, r_name string",
    ).select("r_regionkey", "r_name")


@query(
    "q_scan_json",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with explicit schema (SURVEY §2.1 extension —
    the reference reads only CSV/parquet, but a training-data lake
    ingests JSONL dumps constantly). The nation table is round-tripped
    through a JSON sink once per session and read back; values must
    hash-match the parquet-backed oracle, proving the JSON codec path
    (field binding, type coercion, explicit schema) end-to-end."""
    import os
    import tempfile

    from nyc_taxi_etl_pyspark_spark.sources.io import read_json

    key = spark.sparkContext.applicationId + normalize_uri(sf_dir)
    json_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_json_{abs(hash(key))}"
    )
    if not os.path.isdir(json_dir):
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        ).coalesce(1).write.mode("overwrite").json(json_dir)
    return read_json(
        spark,
        json_dir,
        schema="n_nationkey int, n_name string, n_regionkey int",
    ).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_scan_orc",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source (SURVEY §2.1 extension): supplier round-tripped through
    an ORC sink and read back — ORC carries its own schema, so this
    proves the second columnar codec (stripe stats, column projection)
    produces byte-identical values to the parquet original."""
    import os
    import tempfile

    from nyc_taxi_etl_pyspark_spark.sources.io import read_orc

    key = spark.sparkContext.applicationId + normalize_uri(sf_dir)
    orc_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_orc_{abs(hash(key))}"
    )
    if not os.path.isdir(orc_dir):
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
        ).coalesce(1).write.mode("overwrite").orc(orc_dir)
    return read_orc(spark, orc_dir).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(json_extract(props, '$.k') AS INT) AS k_value
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType as a first-class column: parse the JSON props string into
    map<string,int> (`from_json`), then size / sorted-key list / value
    lookup — the schema-on-read path for semi-structured metadata
    (SURVEY §2.8 extension; q_json_extract covers the direct-path
    variant without materializing the map)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("keys_csv"),
        F.element_at(m, "k").alias("k_value"),
    )


@query(
    "q_string_extract",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 2) AS id_part,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS id_num,
           CAST(length(split_part(c_name, '#', 1)) AS INT) AS prefix_len
    FROM customer
    """,
)
def q_string_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured string extraction (split_part + regexp capture group):
    pull the numeric id out of 'Customer#000000042'-style keys — the
    string-surgery projection of log/ID parsing pipelines. Pure codegen'd
    projection; both functions are 1-based and group-indexed identically
    in Spark and DuckDB."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("id_part"),
        F.regexp_extract(F.col("c_name"), r"([0-9]+)$", 1)
        .cast("bigint")
        .alias("id_num"),
        F.length(F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)))
        .cast("int")
        .alias("prefix_len"),
    )


@query(
    "q_scan_text",
    oracle="SELECT n_nationkey, n_name FROM nation",
)
def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-lines source (SURVEY §2.1 extension — the raw-log ingest
    path: unstructured lines parsed into columns at read time, the way
    a crawler or syslog feed lands before it has a schema). The nation
    table is serialized as '|'-delimited lines once per session, read
    back with ``spark.read.text`` (one ``value`` column), and re-parsed
    with split_part — the round-tripped values must hash-match the
    parquet-backed oracle. At 100 TB the parse is a pure projection
    (no shuffle) and lands line-split-parallel across tasks."""
    import os
    import tempfile

    key = spark.sparkContext.applicationId + normalize_uri(sf_dir)
    txt_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_txt_{abs(hash(key))}"
    )
    if not os.path.isdir(txt_dir):
        load_table(spark, sf_dir, "nation").select(
            F.concat_ws(
                "|", F.col("n_nationkey"), F.col("n_name")
            ).alias("value")
        ).coalesce(1).write.mode("overwrite").text(txt_dir)
    return spark.read.text(txt_dir).select(
        F.split_part(F.col("value"), F.lit("|"), F.lit(1))
        .cast("int")
        .alias("n_nationkey"),
        F.split_part(F.col("value"), F.lit("|"), F.lit(2)).alias("n_name"),
    )
