"""Event-analytics operators, round 2 (SURVEY.md §2 extension): JSON
field profiling, time-series gap filling, funnel analysis. All pure
Catalyst — the product-analytics layer a fact-event table needs beyond
plain aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_json_field_profile",
    oracle="""
    SELECT k AS field_name,
           count(*) AS n_present,
           count(DISTINCT json_extract_string(props, '$.' || k)) AS n_distinct_values
    FROM (
      SELECT props, unnest(json_keys(props)) AS k FROM events
    )
    GROUP BY k
    """,
)
def q_json_field_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured field profiling: which keys appear in the JSON
    payload, how often, with what value cardinality — the schema-drift /
    ingestion-QA scan for a column whose schema is not declared. Each row's
    object parses ONCE to ``map<string,string>``; exploded (key, value)
    pairs feed one partial→final aggregate — no driver-side sampling, no
    schema-inference pass, no per-row JSON-path re-parsing."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.explode(F.from_json("props", "map<string,string>")).alias(
                "field_name", "__v"
            )
        )
        .groupBy("field_name")
        .agg(
            F.count("*").alias("n_present"),
            F.countDistinct("__v").alias("n_distinct_values"),
        )
    )


@query(
    "q_time_gapfill",
    oracle="""
    WITH days AS (
      SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS event_date FROM events
    ), grid AS (
      SELECT event_date, unnest(generate_series(0, 23)) AS event_hour FROM days
    ), actual AS (
      SELECT strftime(ts, '%Y-%m-%d') AS event_date,
             CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour,
             count(*) AS n, round(sum(value) + 1e-9, 4) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_date, CAST(g.event_hour AS INT) AS event_hour,
           coalesce(a.n, 0) AS n_events,
           coalesce(a.sv, 0.0) AS sum_value
    FROM grid g LEFT JOIN actual a
      ON g.event_date = a.event_date AND g.event_hour = a.event_hour
    """,
)
def q_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense (day × 24h) grid left-joined to
    the hourly aggregate so silent hours surface as explicit zeros —
    what dashboards and anomaly detectors need (a missing bucket is a
    signal, not an absence). The grid is generated ENGINE-SIDE
    (sequence + explode over the distinct days — tiny), so no driver
    loop and no external calendar table; the join key is the grid side,
    broadcast against the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    actual = (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
            F.hour("ts").alias("event_hour"),
        )
        .agg(
            F.count("*").alias("n"),
            stable_round(F.sum("value"), 4).alias("sv"),
        )
    )
    grid = (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .distinct()
        .select(
            "event_date",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("event_hour"),
        )
    )
    return (
        grid.join(actual, ["event_date", "event_hour"], "left")
        .select(
            "event_date",
            F.col("event_hour").cast("int").alias("event_hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value"),
        )
    )


@query(
    "q_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'signup') AS first_signup,
             count(*) FILTER (WHERE event_type = 'signup') AS n_signups
      FROM events GROUP BY user_id
    ), converted AS (
      SELECT p.user_id, p.first_signup,
             min(e.ts) AS first_purchase_after
      FROM per_user p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= p.first_signup
      WHERE p.first_signup IS NOT NULL
      GROUP BY p.user_id, p.first_signup
    )
    SELECT count(*) FILTER (WHERE p.first_signup IS NOT NULL) AS n_signed_up,
           count(c.user_id) AS n_converted,
           round(CAST(count(c.user_id) AS DOUBLE)
                 / count(*) FILTER (WHERE p.first_signup IS NOT NULL) + 1e-9, 4)
             AS conversion_rate,
           CAST(floor(avg(epoch(c.first_purchase_after) - epoch(p.first_signup)))
                AS BIGINT) AS avg_seconds_to_convert
    FROM per_user p LEFT JOIN converted c ON p.user_id = c.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (signup → purchase): per user, the first signup
    and the first purchase at-or-after it; rolled up to funnel counts,
    conversion rate, and mean time-to-convert. One aggregate to find
    step-1 entry per user, one conditional join+aggregate for step 2 —
    the ordered-event-pattern shape (min-after-anchor) that avoids
    sorting full event histories per user."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        )
    )
    signed = per_user.filter(F.col("first_signup").isNotNull())
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        signed.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("first_signup")),
        )
        .groupBy("user_id", "first_signup")
        .agg(F.min("p_ts").alias("first_purchase_after"))
    )
    joined = signed.join(
        converted.select("user_id", "first_purchase_after"), "user_id", "left"
    )
    # FRACTIONAL epoch seconds, matching the oracle's epoch() exactly —
    # a per-timestamp cast("long") truncation would shift the mean by up
    # to ~0.5 s and flip the final floor() on a near-integer average.
    gap_s = F.col("first_purchase_after").cast("double") - F.col(
        "first_signup"
    ).cast("double")
    return joined.agg(
        F.count("*").alias("n_signed_up"),
        F.count("first_purchase_after").alias("n_converted"),
        stable_round(
            F.count("first_purchase_after").cast("double") / F.count("*"), 4
        ).alias("conversion_rate"),
        F.floor(F.avg(gap_s)).cast("bigint").alias("avg_seconds_to_convert"),
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_date FROM events
    )
    SELECT strftime(f.cohort_date, '%Y-%m-%d') AS cohort,
           CAST(a.act_date - f.cohort_date AS INT) AS day_offset,
           count(*) AS n_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the canonical product-analytics query:
    users grouped by first-seen date, counted on each subsequent active
    day as a day offset. Two aggregates and one join, all keyed on
    user_id, so at 100 TB the whole plan runs inside ONE hash partitioning
    of user_id (first-seen, distinct-activity, and the join co-locate;
    only the final (cohort, offset) rollup reshuffles — at cohort
    granularity, which is tiny). Integer counts ⇒ hash-exact."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    activity = ev.select(
        "user_id", F.to_date("ts").alias("act_date")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort"),
            F.datediff("act_date", "cohort_date").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
