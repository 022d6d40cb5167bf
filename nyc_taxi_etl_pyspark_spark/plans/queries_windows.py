"""Window-function queries (SURVEY.md §2.5 — absent in the reference,
built here as first-class engine surface).

Every ORDER BY inside a window carries a unique tie-breaker column so
frame contents — and therefore lag/rolling results — are identical across
engines. Rolling/running float aggregates are rounded (frame-order
summation is deterministic, but rounding guards the cross-engine hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS price_rank,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS price_dense_rank
    FROM orders
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank per customer by order value. Ranks are
    tie-stable (equal inputs ⇒ equal rank) so no tie-breaker is needed."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time (SURVEY §2.5 extension)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - prev).alias("delta"),
    )


@query(
    "q_window_rolling",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber,
           round(avg(l_extendedprice) OVER w + 1e-9, 4) AS rolling_avg_price,
           round(sum(l_quantity) OVER w + 1e-9, 4) AS rolling_sum_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row rolling mean/sum per part over ship-date order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, 0)
    )
    return li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        stable_round(F.avg("l_extendedprice").over(w), 4).alias("rolling_avg_price"),
        stable_round(F.sum("l_quantity").over(w), 4).alias("rolling_sum_qty"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 4)
             AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
             AS event_seq
    FROM events
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user sum + sequence number."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        stable_round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        F.row_number().over(w).alias("event_seq"),
    )


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the idiomatic Spark top-k-per-group
    (row_number ≤ k; with AQE this stays a single shuffle + local sort,
    never a global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ntile(4) OVER w AS INT) AS price_quartile,
           round(percent_rank() OVER w + 1e-9, 4) AS price_pct_rank,
           round(cume_dist() OVER w + 1e-9, 4) AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile quartiles / percent_rank /
    cume_dist) per customer — ntile assigns by ROW position, so the order
    carries a unique o_orderkey tie-breaker to stay engine-deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        stable_round(F.percent_rank().over(w), 4).alias("price_pct_rank"),
        stable_round(F.cume_dist().over(w), 4).alias("price_cume_dist"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch_s,
           count(*) OVER w AS n_events_1h,
           round(sum(value) OVER w + 1e-9, 4) AS sum_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per event, activity in the
    TRAILING HOUR of the same user — a value-based frame (rangeBetween on
    epoch seconds), not a row-count frame like q_window_rolling. RANGE
    frames include ALL rows tied on the ordering value, so the result is
    deterministic even with duplicate timestamps — which is exactly why
    the rows-frame formulation would NOT be oracle-safe here. One shuffle
    on user_id; the frame scan is a per-partition sliding pointer."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        epoch_s.alias("ts_epoch_s"),
        F.count("*").over(w).alias("n_events_1h"),
        stable_round(F.sum("value").over(w), 4).alias("sum_value_1h"),
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           nth_value(event_type, 2) OVER w AS second_type,
           count(*) OVER w AS n_user_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a whole-partition frame
    (SURVEY §2.5 extension): every event annotated with its user's first,
    last, and second event type — the session-entry/exit attribution
    shape. The UNBOUNDED..UNBOUNDED frame means ONE pass per partition
    (no per-row frame re-scan); ordering ties are impossible because
    (ts, event_id) is unique per user. At 100 TB this shuffles once on
    user_id — same cost as any per-user window, state O(1) per row."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
        F.count("*").over(w).alias("n_user_events"),
    )


@query(
    "q_window_zscore",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, value,
             avg(value) OVER (PARTITION BY user_id) AS mu,
             stddev_samp(value) OVER (PARTITION BY user_id) AS sd
      FROM events
    )
    SELECT event_id, user_id, value,
           round((value - mu) / NULLIF(sd, 0) + 1e-9, 4) AS z
    FROM s
    WHERE abs((value - mu) / NULLIF(sd, 0)) > 2.5
    """,
)
def q_window_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity z-score outlier flagging: whole-partition window
    aggregates (no ORDER BY ⇒ unbounded frame) give every event its
    user's mean/stddev in ONE shuffle — the groupBy+join spelling would
    shuffle twice. The per-user normalization step of anomaly detection
    / feature standardization; |z| > 2.5 keeps only the outliers.
    stddev_samp accumulation order differs across engines at ~1e-12
    relative — rounded z guards the hash, and the 2.5 cut sits far from
    any fixture value's z (continuous data, measure-zero boundary).
    NULLIF guards sd = 0 (a user whose values are all identical): under
    ANSI mode a bare division would abort the job; a zero-variance user
    has no outliers by definition, so those rows drop out as NULL."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = (F.col("value") - mu) / F.nullif(sd, F.lit(0.0))
    return (
        e.select(
            "event_id",
            "user_id",
            "value",
            z.alias("__z"),
        )
        .filter(F.abs(F.col("__z")) > 2.5)
        .select(
            "event_id", "user_id", "value", stable_round(F.col("__z"), 4).alias("z")
        )
    )


@query(
    "q_window_ewma",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    SELECT event_id, user_id,
           round(
             list_reduce(list_transform(generate_series(1, len(l)),
                           i -> l[i] * pow(0.8, len(l) - i)), (a, b) -> a + b)
             / list_reduce(list_transform(generate_series(1, len(l)),
                           i -> pow(0.8, len(l) - i)), (a, b) -> a + b)
             + 1e-9, 4) AS ewma
    FROM w
    """,
)
def q_window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user over event time —
    the time-series smoothing primitive (trend extraction, anomaly
    baselines) that plain SQL windows cannot express because EWMA's
    recurrence s_t = a*x_t + (1-a)*s_{t-1} references its own previous
    output. Spark-first spelling WITHOUT a stateful UDF: truncate the
    (geometrically vanishing) tail to the last 20 observations, so the
    recurrence becomes a FINITE weighted sum over an ordinary window
    frame — collect the frame with ``collect_list`` (frame order is the
    window order, tie-broken by event_id) and fold it JVM-side with
    indexed ``transform`` + ``aggregate`` higher-order functions:
    weights pow(0.8, n-1-i), normalized by the same folded weight sum
    (finite-window normalization, pandas ``ewm(alpha=0.2).mean()``'s
    convention). Truncation error is bounded by 0.8^20 ≈ 1.2% of the
    oldest mass — below the 4-decimal round — and the oracle replays
    the IDENTICAL left-fold via list_reduce, so the hash check pins
    both the frame contents and the fold. One shuffle on user_id; the
    frame list is 20 elements regardless of history length, so state
    per row is O(20), not O(history) — at 100 TB this outperforms an
    applyInPandas re-sort of every user's full history and never holds
    a whole user in one task's memory."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    l = F.collect_list("value").over(w)
    n = F.size(F.col("__l"))
    num = F.aggregate(
        F.transform(
            F.col("__l"),
            lambda x, i: x * F.pow(F.lit(0.8), n - 1 - i),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    den = F.aggregate(
        F.transform(
            F.col("__l"),
            lambda x, i: F.pow(F.lit(0.8), n - 1 - i),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return (
        e.select("event_id", "user_id", l.alias("__l"))
        .select(
            "event_id",
            "user_id",
            stable_round(num / den, 4).alias("ewma"),
        )
    )
