"""Temporal-sequence operators (SURVEY.md §2 extension): Markov event
transitions, interval-overlap concurrency (sweep line), and SCD2 validity
intervals built from an event stream. All pure Catalyst window/agg plans —
the sequence-analytics layer on top of the plain event aggregates in
queries_events.py.

Scale notes common to all three: every operator partitions its windows by a
high-cardinality key (user_id / event_type), so no global single-reducer
sort exists anywhere; outputs are either bounded (|event_type|² transition
matrix, |event_type| concurrency rows) or proportional to genuine state
changes (SCD2), never to raw input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n_pairs
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n_pairs,
           round(CAST(n_pairs AS DOUBLE)
                 / sum(n_pairs) OVER (PARTITION BY prev_type) + 1e-9, 4)
             AS p_transition
    FROM pairs
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next_type | prev_type) — the model behind next-action prediction,
    anomaly scoring, and session-flow dashboards. One window pass
    partitioned by user_id (ts + event_id total order, no global sort),
    then a hash aggregate onto the |event_type|²-bounded pair space; the
    row-probability normalization runs as a window over that tiny
    aggregate, not over the raw stream — so the expensive part is exactly
    one shuffle of (user_id)-partitioned data regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_pairs"))
    )
    total_w = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_pairs",
        stable_round(
            F.col("n_pairs").cast("double") / F.sum("n_pairs").over(total_w), 4
        ).alias("p_transition"),
    )


@query(
    "q_interval_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT event_type, epoch(ts) AS t, 1 AS delta
      FROM events
      UNION ALL
      SELECT event_type, epoch(ts) + value AS t, -1 AS delta
      FROM events
    ), running AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta)
               AS n_open
      FROM deltas
    )
    SELECT event_type, CAST(max(n_open) AS BIGINT) AS peak_concurrency
    FROM running
    GROUP BY event_type
    """,
)
def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval-overlap concurrency per event type via the classic
    sweep line: each event is an interval [ts, ts + value seconds); explode
    to (+1 at start, −1 at end) deltas, running-sum in event-time order,
    take the max. The running sum uses the default RANGE frame, so all
    delta rows with an identical (t, delta) sort key share one cumulative
    value — making the peak deterministic under any tie order (ends sort
    before starts at the same instant, i.e. end-exclusive intervals), which
    is what lets an order-insensitive hash oracle exist at all. Partitioned
    by event_type: the sweep is |type| independent sorted streams, never a
    global single-reducer timeline; at 100 TB the same plan runs per key
    and the output stays |event_type| rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("double").alias("t0"), "value"
    )
    deltas = ev.select(
        "event_type", F.col("t0").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("t0") + F.col("value")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("t", "delta")
    running = deltas.select(
        "event_type", F.sum("delta").over(w).alias("n_open")
    )
    return running.groupBy("event_type").agg(
        F.max("n_open").alias("peak_concurrency")
    )


@query(
    "q_scd2_build",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM marked
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER
             (PARTITION BY user_id ORDER BY valid_from, event_id)
             AS valid_to,
           (lead(valid_from) OVER
              (PARTITION BY user_id ORDER BY valid_from, event_id)
              IS NULL) AS is_current
    FROM changes
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from a change stream:
    compress each user's event sequence into runs of constant event_type,
    emitting one row per state change with [valid_from, valid_to) validity
    and an is_current flag — the standard way a warehouse derives a
    versioned dimension from CDC/event data. Two window passes over the
    SAME (user_id)-hash-partitioned data (lag to detect changes, lead to
    close intervals), so Catalyst reuses one Exchange for both sorts;
    output is proportional to state changes, not events. event_id rides
    into the interval-closing sort as the tiebreaker — two changes on
    one timestamp would otherwise make valid_to/is_current
    order-dependent."""
    ev = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            "event_id",
            F.lag("event_type").over(w_seq).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    w_iv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        F.lead("valid_from").over(w_iv).isNull().alias("is_current"),
    )


@query(
    "q_gaps_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             event_id - row_number() OVER
               (PARTITION BY user_id ORDER BY event_id) AS island
      FROM events
    ), islands AS (
      SELECT user_id, island,
             min(event_id) AS island_start,
             max(event_id) AS island_end,
             count(*) AS island_len
      FROM seq GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(island_len) AS BIGINT) AS longest_island,
           CAST(min(island_start) AS BIGINT) AS first_id,
           CAST(max(island_end) AS BIGINT) AS last_id
    FROM islands
    GROUP BY user_id
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: partition each user's event-id sequence into
    maximal consecutive runs via the classic ``id − row_number()``
    constant-per-island trick — one window pass, one bounded aggregate;
    the sequence-integrity scan that finds dropped ranges in an ingest
    (a gap between islands = ids that never arrived). Both the window
    and the island aggregate co-locate on the user_id partitioning (one
    Exchange serves all three steps); output is |users| rows with island
    counts and the longest unbroken run."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        (F.col("event_id") - F.row_number().over(w)).alias("island"),
    )
    islands = seq.groupBy("user_id", "island").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count("*").alias("island_len"),
    )
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("island_len").alias("longest_island"),
        F.min("island_start").alias("first_id"),
        F.max("island_end").alias("last_id"),
    )


@query(
    "q_user_growth",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS d
      FROM events GROUP BY user_id
    ), new_by_day AS (
      SELECT d, count(*) AS n_new FROM firsts GROUP BY d
    ), active AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d,
             count(DISTINCT user_id) AS n_active
      FROM events GROUP BY 1
    )
    SELECT a.d AS event_date,
           CAST(a.n_active AS BIGINT) AS n_active,
           CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
           CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY a.d) AS BIGINT)
             AS cum_users
    FROM active a LEFT JOIN new_by_day n ON a.d = n.d
    """,
)
def q_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, active users, NEW users (first-ever
    appearance), and the cumulative distinct-user count — the
    running-distinct metric dashboards want, computed WITHOUT any
    cumulative-distinct state: first-seen attribution turns it into a
    plain daily sum (a user is new exactly once), so the running total
    is a window over the |days|-bounded daily table — the only
    single-partition window in the engine, and it is bounded by
    calendar days, never by data volume. The two heavy aggregates
    (first-seen per user, daily distinct actives) both co-locate on
    user-keyed partitioning."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("d"))
    new_by_day = firsts.groupBy("d").agg(F.count("*").alias("n_new"))
    active = ev.groupBy(day.alias("d")).agg(
        F.countDistinct("user_id").alias("n_active")
    )
    w = Window.orderBy("event_date").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new_by_day, "d", "left")
        .select(
            F.col("d").alias("event_date"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
        )
        .withColumn(
            "cum_users", F.sum("n_new").over(w).cast("bigint")
        )
    )


_PAGERANK_EVENT_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
edges AS (
  SELECT DISTINCT prev_type AS src, event_type AS dst
  FROM seq WHERE prev_type IS NOT NULL
),
nodes AS (SELECT src AS token FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n_nodes FROM nodes),
pr0 AS (SELECT token, 1.0 / nn.n_nodes AS pr FROM nodes CROSS JOIN nn),
m1 AS (
  SELECT e.dst AS token, sum(p.pr / d.deg) AS mass
  FROM edges e JOIN pr0 p ON e.src = p.token JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr1 AS (
  SELECT nodes.token,
         (1.0 - 0.85) / nn.n_nodes + 0.85 * coalesce(m1.mass, 0.0) AS pr
  FROM nodes CROSS JOIN nn LEFT JOIN m1 ON nodes.token = m1.token
),
m2 AS (
  SELECT e.dst AS token, sum(p.pr / d.deg) AS mass
  FROM edges e JOIN pr1 p ON e.src = p.token JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr2 AS (
  SELECT nodes.token,
         (1.0 - 0.85) / nn.n_nodes + 0.85 * coalesce(m2.mass, 0.0) AS pr
  FROM nodes CROSS JOIN nn LEFT JOIN m2 ON nodes.token = m2.token
),
m3 AS (
  SELECT e.dst AS token, sum(p.pr / d.deg) AS mass
  FROM edges e JOIN pr2 p ON e.src = p.token JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr3 AS (
  SELECT nodes.token,
         (1.0 - 0.85) / nn.n_nodes + 0.85 * coalesce(m3.mass, 0.0) AS pr
  FROM nodes CROSS JOIN nn LEFT JOIN m3 ON nodes.token = m3.token
)
SELECT pr3.token AS event_type,
       coalesce(deg.deg, 0) AS out_degree,
       round(pr3.pr + 1e-9, 6) AS pr
FROM pr3 LEFT JOIN deg ON pr3.token = deg.src
"""


@query("q_pagerank_event_graph", oracle=_PAGERANK_EVENT_ORACLE)
def q_pagerank_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the DIRECTED event-type transition graph (round
    12): which states of the user journey are most central under random
    traversal of observed transitions — the flow-centrality complement
    to q_event_transitions' first-order probabilities (TextRank is the
    same operator over the undirected token co-occurrence graph; this
    exercises ``operators/graph.py::pagerank`` on a second domain and
    on directed semantics — sinks receive rank but emit no mass). The
    edge derivation is one user-partitioned window pass; the graph
    itself is |event_type|²-bounded, so the three PageRank iterations
    run over a tiny, checkpointed edge list regardless of corpus size.
    The oracle unrolls the identical three damped iterations as chained
    CTEs, damping spelled (1.0 - 0.85) in both engines."""
    from nyc_taxi_etl_pyspark_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .select(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    return pr.select(
        F.col("token").alias("event_type"),
        F.col("deg").alias("out_degree"),
        stable_round(F.col("pr"), 6).alias("pr"),
    )


_PAGERANK_WEIGHTED_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
edges AS (
  SELECT prev_type AS src, event_type AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
nodes AS (SELECT src AS token FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, sum(w) AS wdeg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n_nodes FROM nodes),
pr0 AS (SELECT token, 1.0 / nn.n_nodes AS pr FROM nodes CROSS JOIN nn),
m1 AS (
  SELECT e.dst AS token, sum(p.pr * e.w / d.wdeg) AS mass
  FROM edges e JOIN pr0 p ON e.src = p.token JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr1 AS (
  SELECT nodes.token,
         (1.0 - 0.85) / nn.n_nodes + 0.85 * coalesce(m1.mass, 0.0) AS pr
  FROM nodes CROSS JOIN nn LEFT JOIN m1 ON nodes.token = m1.token
),
m2 AS (
  SELECT e.dst AS token, sum(p.pr * e.w / d.wdeg) AS mass
  FROM edges e JOIN pr1 p ON e.src = p.token JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr2 AS (
  SELECT nodes.token,
         (1.0 - 0.85) / nn.n_nodes + 0.85 * coalesce(m2.mass, 0.0) AS pr
  FROM nodes CROSS JOIN nn LEFT JOIN m2 ON nodes.token = m2.token
),
m3 AS (
  SELECT e.dst AS token, sum(p.pr * e.w / d.wdeg) AS mass
  FROM edges e JOIN pr2 p ON e.src = p.token JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr3 AS (
  SELECT nodes.token,
         (1.0 - 0.85) / nn.n_nodes + 0.85 * coalesce(m3.mass, 0.0) AS pr
  FROM nodes CROSS JOIN nn LEFT JOIN m3 ON nodes.token = m3.token
)
SELECT pr3.token AS event_type,
       round(coalesce(deg.wdeg, 0.0) + 1e-9, 4) AS out_weight,
       round(pr3.pr + 1e-9, 6) AS pr
FROM pr3 LEFT JOIN deg ON pr3.token = deg.src
"""


@query("q_pagerank_weighted_transitions", oracle=_PAGERANK_WEIGHTED_ORACLE)
def q_pagerank_weighted_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WEIGHTED PageRank over the event-type transition graph (round
    12): the random walk follows observed transition FREQUENCIES
    (edge weight = pair count, mass pr·w/Σw per out-edge) — the
    Markov-chain flow-centrality that q_pagerank_event_graph's
    unweighted walk approximates when all transitions are equally
    likely. Same |event_type|²-bounded, checkpointed edge list; the
    oracle unrolls the identical three damped weighted iterations."""
    from nyc_taxi_etl_pyspark_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    pr = pagerank(edges, iterations=3, damping=0.85, weight="w")
    return pr.select(
        F.col("token").alias("event_type"),
        stable_round(F.col("deg"), 4).alias("out_weight"),
        stable_round(F.col("pr"), 6).alias("pr"),
    )
