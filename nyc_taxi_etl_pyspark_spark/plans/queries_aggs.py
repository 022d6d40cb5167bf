"""Aggregation queries (SURVEY.md §2.4) + sorts/limits/top-k/sampling
(§2.6).

Flagship: ``q_agg_by_hour`` — the reference's trips_by_hour aggregate
(``src/pipeline/etl_writer.py:24-32``) retargeted to the ``events`` fact
table. Catalyst plans all of these as partial (map-side) + final
HashAggregate, which is exactly the two-phase shape that scales: the
shuffle carries one row per (group × partition), not per input row.

Float policy: sums/avgs/stddevs over double columns are rounded to 4
decimals in BOTH engines (accumulation order differs across engines;
integer-valued doubles like l_quantity stay exact regardless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_agg_by_hour",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour,
           count(*) AS total_events,
           round(avg(value) + 1e-9, 4) AS avg_value,
           round(sum(value) + 1e-9, 4) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_agg_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — multi-key hash aggregate by (date, hour).

    Re-expresses the reference's trips_by_hour query
    (``src/pipeline/etl_writer.py:24-32``: groupBy(pickup_date,
    pickup_hour).agg(count, avg, avg, avg)) on ``events``. Unlike the
    reference we compute EXACT aggregates — its 5%-pre-sample
    (``etl_writer.py:20-22``) was a VM-survival hack, not semantics
    (SURVEY §4.2); sampling stays available via ``q_sample``.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            # date emitted as 'yyyy-MM-dd' STRING: cross-engine date
            # rendering is ambiguous (DuckDB DATE → pandas midnight
            # datetime), strings hash identically everywhere.
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
            F.hour("ts").alias("event_hour"),
        )
        .agg(
            F.count("*").alias("total_events"),
            stable_round(F.avg("value"), 4).alias("avg_value"),
            stable_round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query("q_count", oracle="SELECT count(*) AS n_rows FROM lineitem")
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count (ref ``src/pipeline/main_etl.py:81``) as a DataFrame,
    not a driver-side action."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@query(
    "q_agg_sum_min_max_stddev",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity) + 1e-9, 4) AS sum_qty,
           round(sum(l_extendedprice) + 1e-9, 4) AS sum_price,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS sum_disc_price,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
           round(avg(l_discount) + 1e-9, 4) AS avg_disc,
           round(stddev_samp(l_extendedprice) + 1e-9, 4) AS std_price,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_sum_min_max_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate breadth (absent in reference; SURVEY §2.4
    extension)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        stable_round(F.sum("l_quantity"), 4).alias("sum_qty"),
        stable_round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        stable_round(
            F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 4
        ).alias("sum_disc_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        stable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
        stable_round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5) + 1e-9, 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9) + 1e-9, 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.25) + 1e-9, 4) AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ↔
    DuckDB ``quantile_cont``, both linear interpolation — bit-comparable
    after stable rounding). Exact percentile sorts each group's values;
    at 100 TB use the mergeable-sketch path ``q_agg_approx_percentile``."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias(
            "median_price"
        ),
        stable_round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias(
            "p90_price"
        ),
        stable_round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25_qty"),
    )


@query("q_agg_approx_percentile", oracle=None)  # sketch-based => rows-only
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the Greenwald-Khanna sketch
    (``approx_percentile``): mergeable partial state, no per-group sort —
    the percentile that scales (bounded memory per group at any data
    size). Approximate ⇒ rows-only; exactness baseline is
    q_agg_percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "median_price_approx"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(10000)).alias(
            "p90_price_approx"
        ),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (SURVEY §2.4 extension). Catalyst expands
    multi-distinct into an Expand + two-phase aggregate — still one
    shuffle per distinct set, no driver work."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query("q_agg_approx_distinct", oracle=None)  # approximate => rows-only
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (SURVEY §2.4 extension) — the
    100 TB path for cardinality estimation: one pass, fixed-size sketch,
    no distinct-expand shuffle. Approximate, so rows-only checked."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity) + 1e-9, 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchical grouping sets (SURVEY §2.4 extension)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        stable_round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_extendedprice) + 1e-9, 4) AS sum_price
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (SURVEY §2.4 extension)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        stable_round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


@query(
    "q_orderby",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort + limit (ref ``etl_writer.py:35`` orderBy).

    Spark plans orderBy+limit as TakeOrderedAndProject — per-partition
    top-N then a driver merge of N×partitions rows, never a full global
    sort shuffle. The unique ``o_orderkey`` tie-breaker makes the result
    set deterministic across engines.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 50
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic limit (ref ``src/models/trainer.py:51`` caps rows; a
    bare limit is partition-order-dependent, so the engine always pairs
    limit with a total order when results must be stable)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(50)


@query(
    "q_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (SURVEY §2.6): TakeOrderedAndProject physical op."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(25)
    )


@query("q_sample", oracle=None)  # RNG differs across engines => rows-only
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (ref ``etl_writer.py:20-22``:
    sample(False, 0.05, seed=42))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(withReplacement=False, fraction=0.05, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "q_hash_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INTEGER)
          < CAST(floor(0.10 * 65536) AS INTEGER)
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (~10%): keep rows whose
    md5(key) prefix falls under the rate threshold. Unlike seeded RNG
    sampling (q_sample), the SAME rows are selected on any engine, any
    partitioning, any run — the reproducible train/holdout splitter for
    a 100 TB corpus (and the rare sampling that IS oracle-checkable)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10
    ).cast("int")
    return o.filter(bucket < int(0.10 * 65536)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# The stratum→rate mix is CONFIG, not derived from the data: a training
# mix is an input to the pipeline (like etl.py's bounds), so the plan
# never runs a distinct().collect() pre-job to discover strata. Strata
# absent from the map sample at rate 0 (dropped) — the production
# semantic for an explicit mix. For data-driven rates, join a broadcast
# rate table instead (the q_mixture_sample shape in queries_corpus.py).
STRATIFIED_SAMPLE_MIX = {"de": 0.8, "en": 0.3, "es": 0.1, "fr": 0.8, "zh": 0.3}


@query("q_stratified_sample", oracle=None)  # seeded RNG => rows-only
def q_stratified_sample(
    spark: SparkSession, sf_dir: str, mix: dict[str, float] | None = None
) -> DataFrame:
    """Stratified sampling with per-stratum rates (``sampleBy``): the
    corpus-mixing primitive (e.g. keep 80% of en, 30% of de, 10% of fr
    when rebalancing a training mix). The rate map is an operator
    parameter (``STRATIFIED_SAMPLE_MIX`` default) so plan construction
    is collect-free — the engine's former only hot-path collect.
    Seeded RNG ⇒ rows-only; the deterministic alternative is
    q_hash_sample per stratum."""
    d = load_table(spark, sf_dir, "documents")
    fractions = dict(STRATIFIED_SAMPLE_MIX if mix is None else mix)
    return d.sampleBy("lang", fractions=fractions, seed=42).select(
        "doc_id", "lang", "source"
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity) + 1e-9, 4) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS aggregate (a superset shape of rollup/cube): three
    explicit grouping layouts in one pass — Catalyst plans it as a single
    Expand + hash aggregate, not three scans."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_quantity) + 1e-9, 4) AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           round(sum(CASE WHEN event_type = 'click' THEN value END) + 1e-9, 4) AS click,
           round(sum(CASE WHEN event_type = 'error' THEN value END) + 1e-9, 4) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END) + 1e-9, 4) AS purchase,
           round(sum(CASE WHEN event_type = 'signup' THEN value END) + 1e-9, 4) AS signup,
           round(sum(CASE WHEN event_type = 'view' THEN value END) + 1e-9, 4) AS view
    FROM events
    GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregate): one row per day, one column per event
    type. The pivot values are ENUMERATED explicitly — omitting them
    forces Spark to run a distinct-scan job first AND makes the output
    schema data-dependent, both wrong at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("event_date")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.sum("value"))
    )
    return piv.select(
        "event_date",
        *[stable_round(F.col(c), 4).alias(c) for c in
          ("click", "error", "purchase", "signup", "view")],
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice) + 1e-9, 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice) + 1e-9, 4) AS qty_price_covar,
           round(var_samp(l_discount) + 1e-9, 4) AS discount_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group (corr / covar_samp / var_samp) —
    single-pass mergeable moment aggregates (Catalyst partial+final), the
    feature-correlation screen of a dataset-QA pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        stable_round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        stable_round(F.var_samp("l_discount"), 4).alias("discount_var"),
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS INT) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice) + 1e-9, 4) AS bucket_min,
           round(max(o_totalprice) + 1e-9, 4) AS bucket_max
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (data-profiling primitive): bucket =
    floor(value / width). Pure arithmetic bucketing means one partial+
    final aggregate over at most n_buckets groups — the profile pass that
    replaces a driver-side collect-and-bin at 100 TB (contrast
    q_agg_percentile, which needs a full sort or sketch)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            stable_round(F.min("o_totalprice"), 4).alias("bucket_min"),
            stable_round(F.max("o_totalprice"), 4).alias("bucket_max"),
        )
        .orderBy("bucket")
    )


@query(
    "q_agg_distinct_twophase",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct count via explicit two-phase aggregation:
    groupBy(key, user) dedups partially map-side, then groupBy(key)
    counts the survivors. Semantically identical to count(DISTINCT) (the
    oracle), but the first phase spreads a skewed key across partitions
    by the (key, user) composite — the hand-rolled shape of Catalyst's
    distinct-aggregate Expand, useful when one hot key would otherwise
    bottleneck a single reducer at 100 TB. NULL members are filtered in
    phase 1 because count(DISTINCT) ignores NULLs — without the filter
    the rewrite counts a NULL group and drifts off the oracle on
    nullable data."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id")
        .where(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.lit(1).alias("__one"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "q_time_rollup_multigrain",
    oracle="""
    SELECT event_date, event_hour, grain, n_events,
           round(sum_value + 1e-9, 4) AS sum_value
    FROM (
      SELECT strftime(ts, '%Y-%m-%d') AS event_date,
             CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour,
             CASE WHEN GROUPING(EXTRACT(hour FROM ts)) = 0
                  THEN 'hour' ELSE 'day' END AS grain,
             count(*) AS n_events,
             sum(value) AS sum_value
      FROM events
      GROUP BY GROUPING SETS (
        (strftime(ts, '%Y-%m-%d'), EXTRACT(hour FROM ts)),
        (strftime(ts, '%Y-%m-%d'))
      )
    )
    """,
)
def q_time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the continuous-aggregate /
    hypertable-rollup pattern): hourly AND daily aggregates of the event
    stream in ONE pass — GROUPING SETS plans as a single Expand (2 rows
    per input) + one partial→final aggregate, vs scanning the fact table
    once per grain. ``grouping()`` labels each output row's grain so
    downstream readers can route. At 100 TB this is the difference
    between one shuffle and N shuffles for N rollup levels."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__events_rollup")
    return spark.sql(
        """
        SELECT event_date, event_hour, grain, n_events,
               round(sum_value + 1e-9, 4) AS sum_value
        FROM (
          SELECT date_format(ts, 'yyyy-MM-dd') AS event_date,
                 CAST(hour(ts) AS INT) AS event_hour,
                 CASE WHEN GROUPING(hour(ts)) = 0
                      THEN 'hour' ELSE 'day' END AS grain,
                 count(*) AS n_events,
                 sum(value) AS sum_value
          FROM __events_rollup
          GROUP BY GROUPING SETS (
            (date_format(ts, 'yyyy-MM-dd'), hour(ts)),
            (date_format(ts, 'yyyy-MM-dd'))
          )
        )
        """
    )


@query(
    "q_agg_equidepth_histogram",
    oracle="""
    SELECT decile,
           count(*) AS n_orders,
           round(min(o_totalprice) + 1e-9, 4) AS lo,
           round(max(o_totalprice) + 1e-9, 4) AS hi
    FROM (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    GROUP BY decile
    ORDER BY decile
    """,
)
def q_agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (deciles of the price distribution): ntile
    over a total order (price, key tie-break ⇒ deterministic bucket
    edges), then per-bucket count/min/max. Complements q_agg_histogram's
    fixed-width buckets: equal-width answers "what does the domain look
    like", equal-depth answers "where is the mass". The global ntile is a
    single-partition window — fine for profiling output sizes; at 100 TB
    the sketch path (q_agg_approx_percentile) replaces it."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            stable_round(F.min("o_totalprice"), 4).alias("lo"),
            stable_round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "q_data_quality_audit",
    oracle="""
    SELECT 'orders_null_custkey' AS check_name,
           count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations,
           count(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_price',
           count(*) FILTER (WHERE o_totalprice <= 0), count(*)
    FROM orders
    UNION ALL
    SELECT 'orders_future_date',
           count(*) FILTER (WHERE o_orderdate > TIMESTAMP '2002-01-01 00:00:00'),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', count(*), NULL
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
    )
    UNION ALL
    SELECT 'lineitem_discount_range',
           count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5), count(*)
    FROM lineitem
    """,
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit (dbt-test-style constraint checks as ONE
    engine query): null keys, domain bounds, freshness, and referential
    integrity (orphan lineitems via anti join), each reported as
    (check_name, n_violations, n_checked). The column checks fold into
    conditional aggregates over a single scan per table; the FK check is
    one broadcast/shuffled anti join — the audit pass a 100 TB ingest
    runs before promoting a batch."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def check(df, name, cond):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.when(cond, 1)).alias("n_violations"),
            F.count("*").alias("n_checked"),
        )

    orphans = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("lineitem_orphan_orderkey").alias("check_name"),
            "n_violations",
            F.lit(None).cast("bigint").alias("n_checked"),
        )
    )
    return (
        check(o, "orders_null_custkey", F.col("o_custkey").isNull())
        .unionByName(
            check(o, "orders_nonpositive_price", F.col("o_totalprice") <= 0)
        )
        .unionByName(
            check(
                o,
                "orders_future_date",
                F.col("o_orderdate") > F.lit("2002-01-01 00:00:00").cast("timestamp"),
            )
        )
        .unionByName(orphans)
        .unionByName(
            check(
                li,
                "lineitem_discount_range",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
            )
        )
    )


@query(
    "q_agg_argminmax",
    oracle="""
    SELECT event_type,
           max(CASE WHEN rn_desc = 1 THEN event_id END) AS max_value_event,
           max(CASE WHEN rn_asc = 1 THEN event_id END) AS min_value_event,
           round(max(value) + 1e-9, 4) AS max_value,
           round(min(value) + 1e-9, 4) AS min_value
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rn_desc,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn_asc
      FROM events
    )
    GROUP BY event_type
    """,
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregate (``max_by``/``min_by``): WHICH event holds
    each group's extreme value — the single-pass alternative to the
    window row_number idiom when only the witness row's key is needed
    (one partial→final aggregate, no sort, no window shuffle). Ties on
    ``value`` are broken by event_id via lexicographic (value, id)
    ordering in BOTH engines, making the witness deterministic —
    bare max_by over a tied column would be scan-order-dependent."""
    ev = load_table(spark, sf_dir, "events")
    ord_asc = F.struct(F.col("value"), F.col("event_id").cast("double"))
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", ord_asc).alias("max_value_event"),
        F.min_by("event_id", ord_asc).alias("min_value_event"),
        stable_round(F.max("value"), 4).alias("max_value"),
        stable_round(F.min("value"), 4).alias("min_value"),
    )


@query(
    "q_agg_salted",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value,
           round(min(value) + 1e-9, 4) AS min_value,
           round(max(value) + 1e-9, 4) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe SALTED aggregation: phase 1 aggregates on
    (key, salt=hash(row) mod 16) so a hot key's rows spread over 16
    reducers; phase 2 merges the 16 partials per key. The oracle is the
    PLAIN single-phase aggregate — salting must be semantically
    invisible (count/sum/min/max are all commutative monoids, so the
    two-phase merge is exact; avg would be re-derived as sum/count).
    This is the hand-rolled escape hatch for when one key holds 10% of
    100 TB and even AQE's skew handling can't split a single aggregate
    group across tasks."""
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("event_type", "__salt")
        .agg(
            F.count("*").alias("__c"),
            F.sum("value").alias("__s"),
            F.min("value").alias("__mn"),
            F.max("value").alias("__mx"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("__c").alias("n_events"),
        stable_round(F.sum("__s"), 4).alias("sum_value"),
        stable_round(F.min("__mn"), 4).alias("min_value"),
        stable_round(F.max("__mx"), 4).alias("max_value"),
    )


@query(
    "q_sample_fixed_per_group",
    oracle="""
    SELECT event_type, event_id, user_id
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY event_type
        ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
      ) <= 20
    """,
)
def q_sample_fixed_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT-k-per-group sample: rank rows inside each
    group by a content hash (md5 of the key — uniform, engine-portable,
    partitioning-independent) and keep the first 20. The reproducible
    version of per-stratum reservoir sampling: same 20 rows on any
    engine, any run, any cluster size — what q_stratified_sample's
    seeded RNG cannot promise across engines. At 100 TB the window
    shuffles once on the group key; if a single group is too hot, the
    same hash order lets a pre-filter on md5 prefix cheaply shed most
    rows before ranking."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 20)
        .select("event_type", "event_id", "user_id")
    )


@query(
    "q_column_profile",
    oracle="""
    WITH base AS (
      SELECT count(*) AS n_rows,
             count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS ndv1,
             min(CAST(o_orderkey AS DOUBLE)) AS mn1,
             max(CAST(o_orderkey AS DOUBLE)) AS mx1,
             count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS ndv2,
             min(CAST(o_custkey AS DOUBLE)) AS mn2,
             max(CAST(o_custkey AS DOUBLE)) AS mx2,
             count(o_totalprice) AS nn3, count(DISTINCT o_totalprice) AS ndv3,
             min(o_totalprice) AS mn3, max(o_totalprice) AS mx3
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_nonnull, ndv1 AS ndv,
           round(mn1 + 1e-9, 4) AS min_value, round(mx1 + 1e-9, 4) AS max_value
    FROM base
    UNION ALL
    SELECT 'o_custkey', n_rows, nn2, ndv2,
           round(mn2 + 1e-9, 4), round(mx2 + 1e-9, 4) FROM base
    UNION ALL
    SELECT 'o_totalprice', n_rows, nn3, ndv3,
           round(mn3 + 1e-9, 4), round(mx3 + 1e-9, 4) FROM base
    """,
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass multi-column profile (the ANALYZE TABLE / optimizer-
    statistics primitive): per-column non-null count, exact NDV, and
    min/max, computed for all columns in a SINGLE scan and unpivoted
    with ``stack`` into one row per column. The exact-NDV trio plans as
    one Expand (one input row per distinct-aggregate) + partial/final
    aggregates — one pass over 100 TB instead of one scan per column;
    swap countDistinct for approx_count_distinct when sketch precision
    suffices. These are the stats that feed broadcast-threshold and
    join-reorder decisions."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    aggs = [F.count("*").alias("n_rows")]
    for i, c in enumerate(cols, 1):
        aggs += [
            F.count(c).alias(f"nn{i}"),
            F.countDistinct(c).alias(f"ndv{i}"),
            F.min(F.col(c).cast("double")).alias(f"mn{i}"),
            F.max(F.col(c).cast("double")).alias(f"mx{i}"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn{i}, ndv{i}, mn{i}, mx{i}"
        for i, c in enumerate(cols, 1)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nonnull, ndv, __mn, __mx)"
        ),
        "n_rows",
    ).select(
        "col_name",
        "n_rows",
        "n_nonnull",
        "ndv",
        stable_round(F.col("__mn"), 4).alias("min_value"),
        stable_round(F.col("__mx"), 4).alias("max_value"),
    )


@query(
    "q_winsorize",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.05) + 1e-9, 6) AS p05,
             round(quantile_cont(l_extendedprice, 0.95) + 1e-9, 6) AS p95
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(avg(l.l_extendedprice) + 1e-9, 4) AS avg_raw,
           round(avg(least(greatest(l.l_extendedprice, s.p05), s.p95)) + 1e-9, 4)
             AS avg_winsor,
           CAST(sum(CASE WHEN l.l_extendedprice < s.p05
                         OR l.l_extendedprice > s.p95
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (percentile-clipped) aggregation: clamp each value into
    its group's [p05, p95] band before averaging — the robust-statistics
    guard against heavy-tailed columns (fare outliers in the reference's
    domain; doc-length outliers in a corpus). Two-pass shape: a
    |groups|-row exact-percentile table (broadcast) re-probes the fact
    scan, so the big side is scanned twice but never shuffled on a
    per-row key; at 100 TB swap the exact percentile for the
    approx_percentile sketch and the shape is unchanged. Spark
    ``percentile`` ↔ DuckDB ``quantile_cont`` are both linear
    interpolation (q_agg_percentile proves parity) — but the interpolated
    thresholds can differ by 1 ulp between engines, which would flip the
    strict comparisons in ``n_clipped`` (an integer) on boundary-equal
    values, so both engines QUANTIZE the thresholds (stable round to 6
    decimals) before clipping and counting. The oracle also CASTs the
    conditional sum to BIGINT: DuckDB ``sum(INTEGER)`` yields HUGEINT,
    which pandas widens to float64 (``2004.0``) while Spark emits int64
    (``2004``) — equal numerically but distinct to a value hash."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        stable_round(
            F.percentile("l_extendedprice", F.lit(0.05)), 6
        ).alias("p05"),
        stable_round(
            F.percentile("l_extendedprice", F.lit(0.95)), 6
        ).alias("p95"),
    )
    x = F.col("l_extendedprice")
    clipped = F.least(F.greatest(x, F.col("p05")), F.col("p95"))
    return (
        li.join(F.broadcast(s), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            stable_round(F.avg(x), 4).alias("avg_raw"),
            stable_round(F.avg(clipped), 4).alias("avg_winsor"),
            F.sum(
                F.when((x < F.col("p05")) | (x > F.col("p95")), 1).otherwise(0)
            ).alias("n_clipped"),
        )
    )


@query(
    "q_agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity) + 1e-9, 4) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n,
           round(regr_avgx(l_extendedprice, l_quantity) + 1e-9, 4) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity) + 1e-9, 4) AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression via the NATIVE ``regr_*``
    aggregate family (slope/intercept/r2/count/avgx/avgy) — single-pass
    mergeable moment aggregates (like corr/covar in q_agg_corr), so the
    100 TB plan is partial→final with a |groups|-row result and zero
    Python. The applyInPandas spelling of the same fit
    (q_grouped_ols_pandas) is the custom-logic escape hatch; this is the
    fast path when the statistic is expressible as moments."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.regr_slope(y, x), 4).alias("slope"),
        stable_round(F.regr_intercept(y, x), 4).alias("intercept"),
        stable_round(F.regr_r2(y, x), 4).alias("r2"),
        F.regr_count(y, x).alias("n"),
        stable_round(F.regr_avgx(y, x), 4).alias("avg_x"),
        stable_round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )
