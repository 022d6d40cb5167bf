"""Join queries (SURVEY.md §2.3): the reference's broadcast lookup join
plus the extension surface (inner/semi/anti/snowflake/range/as-of).

Plan hygiene per query: dimension sides are explicitly broadcast; the
range and as-of joins use the bucketed / merge-based operators from
``operators/joins.py`` instead of letting sort-merge degenerate into
per-key cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.operators.joins import (
    salted_join,
    asof_join,
    broadcast_lookup_join,
    range_join_bucketed,
    theta_lt_count_banded,
)
from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

# The engine analog of the reference's 6-row payment_type lookup
# (``src/features/transformations.py:40-44``), keyed on event_type.
EVENT_TYPE_LOOKUP = [
    ("click", "Click interaction"),
    ("view", "Page view"),
    ("purchase", "Purchase completed"),
    ("signup", "Account signup"),
    ("error", "Client error"),
]


@query(
    "q_join_broadcast_lookup",
    oracle="""
    SELECT e.event_id, e.event_type, lkp.type_desc
    FROM events e
    LEFT JOIN (VALUES ('click', 'Click interaction'),
                      ('view', 'Page view'),
                      ('purchase', 'Purchase completed'),
                      ('signup', 'Account signup'),
                      ('error', 'Client error'))
           AS lkp(event_type, type_desc)
      ON e.event_type = lkp.event_type
    """,
)
def q_join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ONE join (``transformations.py:40-46``): fact ⟕
    literal in-memory dimension with an explicit broadcast hint."""
    ev = load_table(spark, sf_dir, "events")
    lookup = spark.createDataFrame(EVENT_TYPE_LOOKUP, "event_type string, type_desc string")
    return broadcast_lookup_join(ev, lookup, on="event_type", how="left").select(
        "event_id", "event_type", "type_desc"
    )


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact⋈dim with a selective dim filter — the filter
    sits on the build side so Catalyst prunes before the join (and with
    AQE can flip to broadcast once the filtered size is known)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having a big order. Semi join
    carries no payload from the right side — at scale this halves shuffle
    volume vs inner-join + distinct."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_snowflake",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           round(sum(c.c_acctbal) + 1e-9, 4) AS sum_acctbal,
           round(avg(c.c_acctbal) + 1e-9, 4) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way snowflake join region⋈nation⋈customer + aggregate. Both
    dims broadcast (25 / 5 rows), so the fact table never shuffles for
    the joins — only the final group-by exchanges data."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            stable_round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
            stable_round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@query(
    "q_join_range",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND epoch(b.ts) >= epoch(a.ts) + 1
     AND epoch(b.ts) <= epoch(a.ts) + 600
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi time-range self-join: pairs of same-user events where b
    follows a within (1s, 600s]. Runs through the bucketed range-join
    operator (two-probe hash join) — NOT a sort-merge degenerating to a
    per-user cartesian, which is the naive plan's failure mode at scale.
    The oracle states the same predicate declaratively (DuckDB IEJoin).
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("event_a"), "user_id", F.col("ts").alias("ts_a")
    )
    b = ev.select(F.col("event_id").alias("event_b"), "user_id", F.col("ts").alias("ts_b"))
    joined = range_join_bucketed(
        a, b, key_cols=["user_id"], left_ts="ts_a", right_ts="ts_b", lower_s=1, upper_s=600
    )
    return joined.select("event_a", "event_b", "user_id")


@query(
    "q_join_asof",
    oracle="""
    SELECT e.event_id, e.user_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_epoch_s,
           (SELECT CAST(floor(epoch(max(c.ts))) AS BIGINT)
            FROM events c
            WHERE c.user_id = e.user_id
              AND c.event_type = 'click'
              AND c.ts <= e.ts) AS last_click_epoch_s
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event picks up the latest same-user click at
    or before it. Merge-based implementation (union + single window pass,
    one shuffle) vs the oracle's correlated-subquery statement of the same
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        errors,
        clicks,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_ts"],
        suffix="_last",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_epoch_s"),
        F.col("click_ts_last").cast("long").alias("last_click_epoch_s"),
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_orders,
           round(sum(o_totalprice) + 1e-9, 2) AS sum_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated (salted) equi-join: the build side is replicated
    8×, probe rows scatter deterministically across replicas — splitting
    any hot customer key over 8 tasks. The oracle runs the PLAIN join:
    salting must be semantically invisible."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = salted_join(
        o.withColumnRenamed("o_custkey", "custkey"),
        c.withColumnRenamed("c_custkey", "custkey"),
        on=["custkey"],
        salt=8,
        probe_hash_col="o_orderkey",
    )
    return j.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        stable_round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
    )


@query(
    "q_join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_mktsegment = 'AUTOMOBILE') c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 100000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer equi-join of two filtered slices — preserves unmatched
    rows on BOTH sides (nulls opposite), completing the join-type surface
    (inner/left/semi/anti/range/as-of elsewhere). Full outer cannot
    broadcast either side; it is always a shuffle join, and AQE handles
    its skew like any sort-merge join."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_theta_count",
    oracle="""
    SELECT s_suppkey, s_name, count(*) AS n_poorer_customers
    FROM supplier s JOIN customer c ON c.c_acctbal < s.s_acctbal
    GROUP BY s_suppkey, s_name
    """,
)
def q_join_theta_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless-theta AGGREGATE (per supplier, how many customers hold a
    smaller balance) — rewritten round 14 from the BroadcastNestedLoopJoin
    spelling (|customer| × |supplier| comparisons: 104.9 s at sf1, 15% of
    the whole sweep) to the counting-sort plan
    (``theta_lt_count_banded``): per-band customer counts + a
    domain-bounded running sum + an equi hash join for same-band pairs
    only. Same aggregate, same oracle, ~linear cost. The general lesson:
    a keyless theta JOIN needs a tiny side, but a keyless theta
    AGGREGATE over an ordered predicate never needs the join at all —
    sort/band the axis and count (guide §2.4: remove the shuffle/join
    outright). Zero-match suppliers are filtered to keep the inner-join
    semantics of the original."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    counted = theta_lt_count_banded(
        c,
        s,
        left_val="c_acctbal",
        right_val="s_acctbal",
        right_keys=["s_suppkey", "s_name"],
        out_col="n_poorer_customers",
    )
    return counted.filter(F.col("n_poorer_customers") > 0)


@query(
    "q_join_asof_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_epoch_s,
           (SELECT CAST(floor(epoch(max(c.ts))) AS BIGINT)
            FROM events c
            WHERE c.user_id = e.user_id
              AND c.event_type = 'click'
              AND c.ts <= e.ts
              AND epoch(c.ts) >= epoch(e.ts) - 600) AS last_click_epoch_s
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE: the latest same-user click
    at-or-before each error counts only if it is at most 10 minutes old,
    else NULL — the market-data/IoT semantics ("don't carry a quote
    forward forever") that a bare as-of join silently violates. Same
    merge-based single-shuffle plan as q_join_asof; the tolerance is one
    post-pass predicate nulling stale matches, so the bound costs
    nothing extra. At scale the tolerance ALSO caps how far back state
    must be retained in the streaming spelling (the watermark analog)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        errors,
        clicks,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_ts"],
        suffix="_last",
    )
    fresh = (
        F.col("ts").cast("double") - F.col("click_ts_last").cast("double")
        <= 600.0
    )
    return joined.select(
        "event_id",
        "user_id",
        F.floor(F.col("ts").cast("double")).cast("bigint").alias("ts_epoch_s"),
        F.when(
            fresh, F.floor(F.col("click_ts_last").cast("double")).cast("bigint")
        ).alias("last_click_epoch_s"),
    )


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name,
           round(o.o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via BUCKETED TABLES (§2.11): orders
    and customer are both materialized ``CLUSTERED BY`` the join key
    into the same bucket count (8), so each side's scan already carries
    hash partitioning on o_custkey/c_custkey and the sort-merge join
    plans with ZERO Exchange — the bucketing pays the shuffle ONCE at
    write time and every subsequent join/aggregation on the key rides
    it free. This is the batch complement to broadcast (q_join_
    broadcast_lookup: dim too big to broadcast, key too hot to reshuffle
    per query) and the design rule the 100 TB layout depends on: fact
    tables bucketed on their primary join key amortize the dominant
    exchange across the whole query mix. The exchange-free plan is
    asserted in tests/test_scale_techniques.py; the oracle is the plain
    join, proving bucketing is semantically invisible. Tables are
    external (LOCATION in the per-fixture scratch dir) and re-registered
    idempotently, so a vanilla driver session rebuilds metadata but
    reuses the bucketed files."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir

    scratch = fixture_scratch_dir("spark_graft_bucketed", sf_dir)
    tag = hashlib.sha256(scratch.encode()).hexdigest()[:8]
    specs = [
        (
            f"bkt_orders_{tag}",
            "orders",
            "o_custkey",
            "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE",
            ["o_orderkey", "o_custkey", "o_totalprice"],
        ),
        (
            f"bkt_customer_{tag}",
            "customer",
            "c_custkey",
            "c_custkey BIGINT, c_name STRING",
            ["c_custkey", "c_name"],
        ),
    ]
    for name, src, key, ddl_cols, cols in specs:
        import os

        os.makedirs(f"{scratch}/{src}", exist_ok=True)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({ddl_cols}) USING PARQUET "
            f"CLUSTERED BY ({key}) INTO 8 BUCKETS "
            f"LOCATION '{scratch}/{src}'"
        )
        # populate guard by ROW COUNT, not mere non-emptiness: a prior
        # run that crashed mid-insertInto leaves a partially filled
        # external table that a nonempty-check would accept forever
        # (persistently returning a subset). A count mismatch —
        # partial load OR stale fixture — triggers an overwrite
        # (truncate + insert in one job), which re-converges on the
        # next run even if THIS overwrite also crashes midway.
        src_df = load_table(spark, sf_dir, src).select(*cols)
        if spark.table(name).count() != src_df.count():
            src_df.write.insertInto(name, overwrite=True)
    o = spark.table(specs[0][0])
    c = spark.table(specs[1][0])
    return o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey",
        "o_custkey",
        "c_name",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )
