"""Event-time window queries (SURVEY.md §2.9): batch-expressible
tumbling/sliding/session windows with DuckDB oracles, plus the real
Structured Streaming run as a rows-only query.

Window starts are emitted as epoch seconds (BIGINT) — engine-neutral,
no timestamp-rendering ambiguity in the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table
from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
    hourly_agg_exprs,
    run_streaming_tumbling_agg,
)


@query(
    "q_window_tumbling",
    oracle="""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts))) AS BIGINT)
             AS window_start_s,
           event_type,
           count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value,
           round(avg(value) + 1e-9, 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time window aggregation (``F.window``) — the
    batch shape of the streaming job in ``streaming/jobs.py`` (identical
    agg expressions by construction)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(*hourly_agg_exprs())
        .select(
            F.col("win.start").cast("long").alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


@query(
    "q_window_sliding",
    oracle="""
    SELECT CAST(floor(epoch(
             time_bucket(INTERVAL '1 hour', ts - o.off * INTERVAL '15 minutes')
             + o.off * INTERVAL '15 minutes')) AS BIGINT) AS window_start_s,
           count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value
    FROM events
    CROSS JOIN (VALUES (0), (1), (2), (3)) AS o(off)
    GROUP BY 1
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour windows every 15 minutes. Spark assigns
    each event to 4 overlapping windows natively; the oracle derives the
    same 4 window-starts per event from offset time_buckets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            stable_round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("long").alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           count(*) AS n_events,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end_s,
           round(sum(value) + 1e-9, 4) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via the lag + cumsum
    idiom — one shuffle on user_id, two window passes, then a per-session
    rollup. The streaming analog is ``session_window`` (q_session_window).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Whole-second floored gap — the SAME boundary rule as the streaming
    # sessionizer (streaming/stateful.py floors to epoch seconds), so
    # events gap±1s apart with sub-second components sessionize
    # identically on both paths.
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("int"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").cast("long").alias("session_start_s"),
        F.max("ts").cast("long").alias("session_end_s"),
        stable_round(F.sum("value"), 4).alias("session_value"),
    )


@query(
    "q_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 600
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
           CAST(floor(epoch(max(ts))) + 600 AS BIGINT) AS session_end_s,
           user_id,
           count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (10-min gap) aggregation — Spark's
    built-in session operator, shared by batch and Structured Streaming.
    Session intervals are ``[first_ts, last_ts + gap)`` and merge while
    the inter-event diff is STRICTLY under the gap — the oracle's
    lag+cumsum sessionization flags ``diff >= 600`` as a new session and
    adds the gap back to the last event for the end bound."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), stable_round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("sw.start").cast("long").alias("session_start_s"),
            F.col("sw.end").cast("long").alias("session_end_s"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_streaming_tumbling",
    oracle="""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts))) AS BIGINT)
             AS window_start_s,
           event_type,
           count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value,
           round(avg(value) + 1e-9, 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run: file-source backlog over the events
    parquet → watermark → tumbling window agg → memory sink, driven to
    completion synchronously. FULL ORACLE (round 4): complete mode over
    a drained deterministic backlog closes every window, so the
    materialized sink must hash-equal the batch aggregation — the same
    strengthening q_streaming_append_tx proved viable; Spark-vs-Spark
    batch equality stays asserted in tests/test_streaming.py."""
    out = run_streaming_tumbling_agg(
        spark, sf_dir, query_name="q_streaming_tumbling"
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_s"),
        "event_type",
        "n_events",
        "sum_value",
        "avg_value",
    )


@query(
    "q_streaming_sliding",
    oracle="""
    SELECT CAST(floor(epoch(
             time_bucket(INTERVAL '1 hour', ts - o.off * INTERVAL '15 minutes')
             + o.off * INTERVAL '15 minutes')) AS BIGINT) AS window_start_s,
           count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value,
           round(avg(value) + 1e-9, 4) AS avg_value
    FROM events
    CROSS JOIN (VALUES (0), (1), (2), (3)) AS o(off)
    GROUP BY 1
    """,
)
def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming sliding-window run (1h window / 15min
    slide): each event feeds 4 overlapping windows. FULL ORACLE (round
    4): same offset-time_bucket derivation as batch q_window_sliding,
    extended with the avg the streaming agg also carries; complete mode
    over the drained backlog makes the sink deterministic. Batch
    equality stays asserted in tests/test_streaming.py."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import run_streaming_sliding_agg

    out = run_streaming_sliding_agg(
        spark, sf_dir, query_name="q_streaming_sliding"
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_s"),
        "n_events",
        "sum_value",
        "avg_value",
    )


@query(
    "q_streaming_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state
    (``dropDuplicatesWithinWatermark``): a key's state is dropped once the
    watermark passes its event time, so an unbounded stream holds
    O(keys per watermark window) state instead of every key ever seen —
    the only dedup shape that survives 100 TB/day. FULL ORACLE (round
    4): the emitted stream projects to the key columns, and every
    fixture duplicate lands within one watermark, so the sink must
    hash-equal DISTINCT keys over the whole backlog — first-arrival
    nondeterminism cannot leak because non-key columns are never
    emitted. Batch parity stays asserted in tests/test_streaming.py."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import run_streaming_dedup

    return run_streaming_dedup(spark, sf_dir, query_name="q_streaming_dedup")


@query("q_streaming_sessionize", oracle=None)  # stateful streaming => rows-only
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (applyInPandasWithState):
    gap-based sessionization with per-user state and event-time timeouts
    — the semantics window()/session_window() can't express (arbitrary
    per-session payload, explicit state lifecycle). Emitted sessions are
    asserted equal to the batch q_sessionize in tests/test_streaming.py."""
    from nyc_taxi_etl_pyspark_spark.streaming.stateful import (
        run_streaming_sessionize,
    )

    return run_streaming_sessionize(
        spark, sf_dir, query_name="q_streaming_sessionize"
    )


@query(
    "q_streaming_interval_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, e.event_id AS err_id
    FROM events c
    JOIN events e
      ON c.event_type = 'click' AND e.event_type = 'error'
     AND e.user_id = c.user_id
     AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream inner join: clicks ⋈ errors per user within a
    10-minute event-time interval, watermarked on BOTH sides so join
    state is evicted once the watermark passes click_ts + interval — the
    bounded-state shape an unbounded 100 TB/day stream requires (an
    unbounded-condition stream-stream join buffers both sides forever).
    FULL ORACLE (round 4): append-mode INNER join pairs emit as matches
    arrive (only outer joins wait on the watermark), and the fixture
    backlog drains before the watermark can evict an unmatched buffer,
    so the emitted pair set must hash-equal the declarative interval
    join. Batch pair-set equality stays asserted in
    tests/test_streaming.py."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
        run_streaming_interval_join,
    )

    return run_streaming_interval_join(
        spark, sf_dir, query_name="q_streaming_interval_join"
    )


@query(
    "q_streaming_static_join",
    oracle="""
    WITH dim AS (
      SELECT event_type, round(avg(value) + 1e-9, 4) AS type_avg_value
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           e.value > d.type_avg_value AS above_type_mean
    FROM events e JOIN dim d USING (event_type)
    """,
)
def q_streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static enrichment join: the event stream probes a
    batch-built per-type dimension (broadcast — no join state at all,
    unlike stream-stream joins) and tags events above their type's batch
    mean. The stateless enrichment shape that carries most production
    streaming joins. FULL ORACLE (round 4): the compare threshold is
    the QUANTIZED (4-decimal) type mean in both engines — the same
    threshold-quantization discipline as the percentile queries, so the
    boolean flag cannot flip on a 1-ulp avg divergence; row-for-row
    equality with the identical batch join stays asserted in
    tests/test_streaming.py."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
        run_streaming_static_join,
    )

    return run_streaming_static_join(
        spark, sf_dir, query_name="q_streaming_static_join"
    )


@query(
    "q_streaming_upsert",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), latest AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_s,
             round(value + 1e-9, 4) AS last_value
      FROM ranked WHERE rn = 1
    ), cnt AS (
      SELECT user_id, event_type, count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT l.user_id, l.event_type, l.last_ts_s, l.last_value, c.n_events
    FROM latest l JOIN cnt c USING (user_id, event_type)
    """,
)
def q_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: micro-batches reduced to latest-state rows
    per (user_id, event_type) and MERGEd into a parquet base inside
    foreachBatch (streaming/jobs.py::run_streaming_upsert_sink — the
    "change stream → queryable current-state table" pattern; write-new /
    atomic-swap per batch). FULL ORACLE (round 4): the converged state
    is deterministic — latest-wins is max_by over the total order
    (ts, event_id) and counts accumulate exactly-once under the replay
    marker — so it must hash-equal the declarative latest-row +
    count-per-key derivation over all events. Convergence to the
    single-batch state table stays asserted in tests/test_streaming.py."""
    import shutil
    import tempfile

    from nyc_taxi_etl_pyspark_spark.streaming.jobs import run_streaming_upsert_sink

    td = tempfile.mkdtemp()
    try:
        base = td + "/state"
        run_streaming_upsert_sink(
            spark, sf_dir, base, checkpoint_path=td + "/ckpt"
        )
        out = spark.read.parquet(base)
        # materialize before the backing files are removed (the state
        # table is |keys|-bounded — ~hundreds of rows, not data-scale)
        state = spark.createDataFrame(out.collect(), out.schema)
        return state.select(
            "user_id",
            "event_type",
            F.col("last_ts").cast("long").alias("last_ts_s"),
            stable_round(F.col("last_value"), 4).alias("last_value"),
            "n_events",
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)


@query(
    "q_streaming_append_tx",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
           round(value + 1e-9, 4) AS value
    FROM events
    """,
)
def q_streaming_append_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming APPEND into the transactional commit-log
    table (``streaming/jobs.py::run_streaming_append_sink_tx``): the
    events backlog streams through foreachBatch, each micro-batch is
    ONE atomic append commit with the replay marker riding the manifest
    meta, and the materialized bronze table is read back by resolving
    the manifest. The oracle is the whole events table — matching it
    proves no batch was lost, duplicated, or torn across the
    stream→commit→snapshot-read path. Idempotent: re-invocations resume
    the drained checkpoint (no new batches) and read the same table.
    Exempt from the collect guard like every q_streaming_* query: the
    streaming run executes during plan construction."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
        run_streaming_append_sink_tx,
    )

    base = fixture_scratch_dir("spark_graft_txstream", sf_dir, anchor="events.parquet")
    run_streaming_append_sink_tx(
        spark, sf_dir, base, checkpoint_path=base + "_ckpt"
    )
    t = TransactionalTable(base)
    return t.read(spark).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
        stable_round(F.col("value"), 4).alias("value"),
    )


@query(
    "q_streaming_expectations",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
           round(value + 1e-9, 4) AS value
    FROM events
    WHERE event_id % 10 != 0 AND value IS NOT NULL
    """,
)
def q_streaming_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest with data-quality expectations
    (``run_streaming_append_sink_tx(expectations=...)``): the events
    backlog streams into the bronze commit-log table gated by two
    declared rules — a synthetic ``event_id % 10 != 0`` and
    ``value IS NOT NULL`` — with ``on_violation="quarantine"``, so each
    micro-batch commits ONLY its passing rows (atomically with the
    replay marker AND the cumulative per-rule violation counters in
    the manifest's sticky app meta), and violators land in the sibling
    quarantine table tagged with the rules they broke, exactly-once
    under its own replay marker. The oracle is the predicate
    conjunction over all events: matching proves the gate dropped
    exactly the violators across every micro-batch with no batch lost,
    duplicated, or torn. Quarantine contents, counter accumulation,
    and fail-mode are pinned in tests/test_streaming.py. Exempt from
    the collect guard like every q_streaming_* query."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
        run_streaming_append_sink_tx,
    )

    base = fixture_scratch_dir(
        "spark_graft_expstream", sf_dir, anchor="events.parquet"
    )
    run_streaming_append_sink_tx(
        spark,
        sf_dir,
        base,
        checkpoint_path=base + "_ckpt",
        expectations={
            "key_not_10": "event_id % 10 != 0",
            "value_present": "value IS NOT NULL",
        },
        on_violation="quarantine",
    )
    t = TransactionalTable(base)
    return t.read(spark).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
        stable_round(F.col("value"), 4).alias("value"),
    )


@query(
    "q_streaming_tx_source",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
           round(value + 1e-9, 4) AS value
    FROM events
    """,
)
def q_streaming_tx_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming READ of the transactional commit log
    (``streaming/jobs.py::run_streaming_tx_source`` over
    ``sources/txstream.py``): events land in a commit-log table as
    three append commits, then a Structured Streaming query tails the
    log — offsets are versions, each appended file is one executor-side
    input partition, replays re-derive the identical file list from the
    immutable manifests (exactly-once without source-side state), and
    non-append commits fail loudly (the Delta streaming-source
    contract). The oracle is the whole events table: matching proves no
    file was skipped, re-emitted, or torn across commit→tail→sink.
    Exempt from the collect guard like every q_streaming_* query: the
    streaming run executes during plan construction."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import run_streaming_tx_source

    return run_streaming_tx_source(
        spark, sf_dir, query_name="q_streaming_tx_source"
    )


@query(
    "q_streaming_silver_agg",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_streaming_silver_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized view through the commit log
    (``streaming/jobs.py::run_streaming_silver_agg``): bronze event
    commits → txstream tail → per-micro-batch partial aggregates
    monoid-merged into a silver transactional table, with the replay
    marker riding the silver manifest (aggregate increments are not
    idempotent — the one streaming shape that NEEDS exactly-once).
    The oracle is the full batch aggregate over events: matching
    proves every event entered the state exactly once, across any
    micro-batch slicing (commutative monoids) and any redelivery
    (marker). Exempt from the collect guard like every q_streaming_*
    query: the streaming run executes during plan construction."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
        run_streaming_silver_agg,
    )

    return run_streaming_silver_agg(
        spark, sf_dir, query_name="q_streaming_silver_agg"
    )


@query(
    "q_streaming_rate_limited",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
           round(value + 1e-9, 4) AS value
    FROM events
    """,
)
def q_streaming_rate_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limited streaming read of the commit log
    (``sources/txstream.py`` with ``maxfilespertrigger=2`` — Delta's
    maxFilesPerTrigger admission control): the same three-commit
    events backlog as ``q_streaming_tx_source`` (two files per
    commit), but latestOffset may only admit whole versions while the
    two-new-file budget lasts, so the drain takes one micro-batch PER
    COMMIT instead of one catch-up batch. The oracle is the whole
    events table: matching proves the pacing dropped, duplicated, and
    tore nothing across the batch boundaries it introduced — the
    bounded-batch property a 100 TB backlog needs so per-batch
    shuffle/state memory stays flat. Batch-shape assertions live in
    tests/test_streaming.py (`test_txstream_maxfilespertrigger_*`).
    Exempt from the collect guard like every q_streaming_* query."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import run_streaming_tx_source

    return run_streaming_tx_source(
        spark,
        sf_dir,
        query_name="q_streaming_rate_limited",
        source_options={"maxfilespertrigger": "2"},
    )


@query(
    "q_streaming_cdf",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice,
           'delete' AS _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM orders
    WHERE o_totalprice >= 100000.0 AND o_totalprice <= 120000.0
    UNION ALL
    SELECT o_orderkey, 'R', round(o_totalprice + 1e-9, 4), 'update',
           CAST(2 AS BIGINT)
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice < 20000.0
    UNION ALL
    SELECT o_orderkey + 10000000, 'N', 1.0, 'insert', CAST(3 AS BIGINT)
    FROM orders
    WHERE o_orderkey % 101 = 0
    """,
)
def q_streaming_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CHANGE DATA FEED (``sources/txcdf.py`` — the Delta
    ``readChangeFeed`` source shape): a transactional orders table
    takes a merge-on-read DV delete (v1), a copy-on-write UPDATE (v2),
    and an append (v3); the ``txcdf`` source streams versions 1..3 and
    each micro-batch emits that commit's KEYED SNAPSHOT DIFF — rows
    tagged insert/update/delete + ``_commit_version`` — computed from
    the commit's file diff alone (removed/added files + DV position
    deltas; retained files are provably changeless). The oracle states
    all three diffs declaratively over raw orders: matching proves the
    DV positions resolve to exactly the deleted rows, the CoW rewrite
    emits ONLY the updated rows (the rewritten-but-unchanged rows are
    value-filtered), and the append surfaces as pure inserts.
    Deterministic replay: manifests are immutable, the stream starts
    from a fresh checkpoint each run and re-derives the identical
    batches. Exempt from the collect guard like every q_streaming_*
    query (the streaming run executes during plan construction)."""
    import tempfile

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    register_python_sources(spark)
    base = fixture_scratch_dir("spark_graft_txcdfstream", sf_dir)
    t = TransactionalTable(base)
    if not t.exists():
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        t.commit(o, cluster_by=["o_totalprice"], num_files=8)  # v0
        t.delete_where(  # v1: merge-on-read — the DV position path
            spark,
            "o_totalprice >= 100000.0 AND o_totalprice <= 120000.0",
            merge_on_read=True,
        )
        t.update_where(  # v2: copy-on-write — the rewrite-diff path
            spark,
            {"o_orderstatus": "'R'"},
            "o_orderstatus = 'F' AND o_totalprice < 20000.0",
        )
        t.commit(  # v3: plain append — the insert path
            o.where(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(1.0).alias("o_totalprice"),
            ),
            mode="append",
        )
    stream = (
        spark.readStream.format("txcdf")
        .option("path", base)
        .option("keycols", "o_orderkey")
        .option("startingversion", 1)
        .load()
    )
    sink = "q_streaming_cdf_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="spark_graft_cdf_ckpt_"),
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(sink).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
        "_change_type",
        "_commit_version",
    )
