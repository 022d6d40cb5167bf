"""CDC / upsert query (SURVEY.md §2 round-2 extension).

The reference's only mutation primitive is whole-partition overwrite
(``src/pipeline/etl_writer.py:7-12``); a lakehouse engine needs row-level
MERGE. ``q_merge_upsert`` proves the operator against a deterministic
synthetic change set derived from the base table itself (no RNG, so the
DuckDB oracle replays the identical merge declaratively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.operators.merge import merge_upsert
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             round(o_totalprice * 1.1 + 1e-9, 4) AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', 100.0
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL
                THEN u.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
           round((CASE WHEN u.o_orderkey IS NOT NULL
                       THEN u.o_totalprice ELSE b.o_totalprice END) + 1e-9, 4)
             AS o_totalprice
    FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (latest-wins upsert) on a deterministic change set:
    every 7th order updated (status 'U', price ×1.1), every 97th order
    re-keyed as an insert. One full-outer join on the merge key; with a
    small CDC batch AQE broadcasts it and the base side never shuffles.
    Updates and inserts verified in one pass against the oracle's
    declarative replay."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        stable_round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    merged = merge_upsert(o, updates, key_cols=["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_table_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             round(o_totalprice * 1.1 + 1e-9, 4) AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', 100.0
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL
                THEN u.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
           round((CASE WHEN u.o_orderkey IS NOT NULL
                       THEN u.o_totalprice ELSE b.o_totalprice END) + 1e-9, 4)
             AS o_totalprice
    FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_tx_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional MERGE INTO through the manifest commit-log table
    (``sources/txtable.py``): the base snapshot is committed once, the
    same deterministic change set as ``q_merge_upsert`` is merged with
    optimistic concurrency, and the RESULT IS READ BACK FROM STORAGE by
    resolving the latest manifest — so the oracle checks the whole
    protocol round-trip (stage → atomic manifest put → snapshot read),
    not just the join. Idempotent across invocations: latest-wins with
    a fixed change set is a fixpoint, and ``vacuum`` bounds retained
    versions. The object-store-safety contract (no rename anywhere on
    the path) is what lets MERGE/OPTIMIZE run where the reference
    actually stores data (``src/gcs/paths.py:1-4``)."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txtable", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o)
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        stable_round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    t.merge(spark, updates, ["o_orderkey"])
    t.vacuum(retain_versions=2)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_incremental_agg",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value,
           round(min(value) + 1e-9, 4) AS min_value,
           round(max(value) + 1e-9, 4) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh):
    a previously-materialized per-key aggregate STATE (here, the rows
    with event_id % 10 < 7, standing in for yesterday's state table) is
    merged with a freshly-aggregated DELTA (the remaining rows) by
    re-aggregating the union of partial states — sum-of-counts,
    sum-of-sums, min-of-mins, max-of-maxes. The oracle is the full
    recompute over all events: merging partials must be EXACTLY the
    whole, which holds because every aggregate here is a commutative
    monoid (avg would be carried as sum+count and divided at read time).
    At 100 TB this is the difference between re-scanning the corpus per
    refresh and scanning only the delta: state is |keys| rows, the merge
    is a |keys|-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    is_old = F.pmod(F.col("event_id"), F.lit(10)) < 7

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("__c"),
            F.sum("value").alias("__s"),
            F.min("value").alias("__mn"),
            F.max("value").alias("__mx"),
        )

    state = partial(ev.where(is_old))
    delta = partial(ev.where(~is_old))
    return (
        state.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("__c").alias("n_events"),
            stable_round(F.sum("__s"), 4).alias("sum_value"),
            stable_round(F.min("__mn"), 4).alias("min_value"),
            stable_round(F.max("__mx"), 4).alias("max_value"),
        )
    )


@query(
    "q_tx_expectations",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 13 != 0 AND o_totalprice > 0
    """,
)
def q_tx_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-time data-quality expectations (the Delta Live Tables
    EXPECT shape, ``txtable.TransactionalTable.commit_with_expectations``):
    orders is committed under two declared rules — a synthetic
    ``o_orderkey % 13 != 0`` that quarantines every 13th order, and an
    always-true ``o_totalprice > 0`` — with ``on_violation="quarantine"``,
    so violating rows land in the sibling ``_quarantine`` table tagged
    with the rules they broke, per-rule violation counts ride the
    manifest meta, and ONLY passing rows become the snapshot. The query
    reads the committed table back; the oracle is the conjunction of
    the predicates over raw orders, proving the gate dropped exactly
    the violators and the round-trip lost nothing. Fail-closed and
    drop modes, the quarantine contents, and the manifest audit trail
    are pinned in tests/test_txtable.py."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txexpect", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit_with_expectations(
            o,
            {
                "key_not_13": "o_orderkey % 13 != 0",
                "positive_price": "o_totalprice > 0",
            },
            on_violation="quarantine",
        )
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_constraints",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 10 < 8
    """,
)
def q_tx_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table CHECK constraints (Delta's ``ALTER TABLE ... ADD
    CONSTRAINT name CHECK (expr)`` shape — round-10 verdict #5,
    ``txtable.add_constraint`` via the SQL front door): the table is
    created from orders with ``o_orderkey % 10 < 6``, constrained with
    ``CHECK (o_totalprice > 0)``, then fed two appends — a PASSING
    batch (``% 10 IN (6, 7)``) that lands, and a VIOLATING batch
    (``% 10 >= 8`` with negated prices) that the sticky constraint
    must reject whole, committing nothing. Unlike per-call
    expectations, the constraint is a table property: the violating
    append is a plain ``commit(mode="append")`` that never mentions
    the rule. The query reads the final table; the oracle replays
    declaratively (base ∪ passing batch, violators absent) — any
    leaked violating row or lost passing row hash-mismatches. The
    rejection is also asserted in-body: a silently-accepted violating
    batch raises rather than returning plausible rows."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        ConstraintViolation,
        TransactionalTable,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txconstraint", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o.filter(F.col("o_orderkey") % 10 < 6))
        execute_dml(
            spark,
            "ALTER TABLE t ADD CONSTRAINT positive_price "
            "CHECK (o_totalprice > 0)",
            tables={"t": t},
        )
        t.commit(
            o.filter(
                (F.col("o_orderkey") % 10 >= 6)
                & (F.col("o_orderkey") % 10 < 8)
            ),
            mode="append",
        )
        violating = o.filter(F.col("o_orderkey") % 10 >= 8).select(
            "o_orderkey",
            "o_orderstatus",
            (-F.col("o_totalprice")).alias("o_totalprice"),
        )
        try:
            t.commit(violating, mode="append")
        except ConstraintViolation:
            pass
        else:  # pragma: no cover - the gate failing IS the bug
            raise RuntimeError(
                "CHECK constraint silently accepted a violating append"
            )
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_replace_where",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders WHERE o_orderstatus <> 'F'
    UNION ALL
    SELECT o_orderkey + 50000000, 'F' AS o_orderstatus,
           round(o_totalprice * 0.5 + 1e-9, 4) AS o_totalprice
    FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0
    """,
)
def q_tx_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPLACE WHERE — Delta's predicate overwrite (round-10 verdict
    #7, ``txtable.replace_where`` via the SQL front door's ``INSERT
    INTO t REPLACE WHERE <pred> <query>``): orders is committed whole,
    then the ``o_orderstatus = 'F'`` region is atomically replaced —
    deleted and re-filled with a derived batch (every 3rd F order,
    re-keyed +50M, price halved) in ONE commit, band/bloom-pruned like
    DELETE. The oracle replays declaratively: non-F rows unchanged ∪
    the replacement batch (CASE/anti-filter replay) — a leaked old F
    row, a lost non-F row, or a replacement row written outside its
    region all hash-mismatch. Validation (replacement rows must
    satisfy the predicate), CHECK-constraint interplay, and the
    commit-race retry are pinned in tests/test_txtable.py."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txreplwhere", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_orderkey"], bloom_by=["o_orderstatus"])
        repl = o.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 3 == 0)
        ).select(
            (F.col("o_orderkey") + 50000000).alias("o_orderkey"),
            F.lit("F").alias("o_orderstatus"),
            (F.col("o_totalprice") * 0.5).alias("o_totalprice"),
        )
        repl.createOrReplaceTempView("replwhere_src")
        execute_dml(
            spark,
            "INSERT INTO t REPLACE WHERE o_orderstatus = 'F' "
            "SELECT * FROM replwhere_src",
            tables={"t": t},
        )
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_incremental_join_view",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name,
           round(o.o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance by delta propagation: the
    materialized view ``orders JOIN customer`` is refreshed from its
    previous state plus the classic three delta terms

        new_view = old_view UNION (dR JOIN S_old)
                            UNION (R_old JOIN dS)
                            UNION (dR JOIN dS)

    (insert-only deltas; deletes retract via the same terms anti-joined,
    upserts via q_merge_upsert on the view key). The deterministic split
    — orders with ``o_orderkey % 10 < 7`` and customers with
    ``c_custkey % 4 != 0`` stand in for yesterday's snapshots, the
    complements for today's arrivals — lets the oracle be the FULL
    recompute join: matching proves the algebra drops and duplicates
    nothing. This is the join analogue of q_incremental_agg's partial
    re-aggregation; at 100 TB the three delta joins each have at least
    one delta-sized (small, broadcastable) side, so a refresh costs
    O(|delta| + |matches|) instead of re-shuffling both full tables —
    the difference between an hourly view refresh scanning an hour and
    scanning a decade."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    r_old = o.where(F.pmod(F.col("o_orderkey"), F.lit(10)) < 7)
    r_new = o.where(~(F.pmod(F.col("o_orderkey"), F.lit(10)) < 7))
    s_old = c.where(F.pmod(F.col("c_custkey"), F.lit(4)) != 0)
    s_new = c.where(~(F.pmod(F.col("c_custkey"), F.lit(4)) != 0))

    def j(r: DataFrame, s: DataFrame) -> DataFrame:
        return r.join(s, r["o_custkey"] == s["c_custkey"]).select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
        )

    old_view = j(r_old, s_old)
    return (
        old_view.unionByName(j(r_new, s_old))
        .unionByName(j(r_old, s_new))
        .unionByName(j(r_new, s_new))
    )


@query(
    "q_mv_join_refresh",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name,
           round(o.o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_mv_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized JOIN view maintained through the commit log
    (``operators/mv.py::refresh_join_view`` — the operator form of
    q_incremental_join_view's algebra): orders and customer are
    committed in two append batches each (the same deterministic
    %10/%4 splits), the view bootstraps with a full materialization
    after batch 1, and the second refresh APPENDS only the three delta
    terms — ΔL and ΔR resolved by ``read_appended`` from the manifest
    file-set difference, so the refresh opens only the appended files
    plus the version-pinned old snapshots. The result read back from
    the view table must equal the oracle's full-recompute join over
    ALL the data: the whole protocol — delta extraction, delta
    propagation, append commit, recorded base versions — is
    hash-proven, not just the algebra. Non-append windows and refresh
    races are pinned in tests/test_txtable.py."""
    from nyc_taxi_etl_pyspark_spark.operators.mv import refresh_join_view
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    root = fixture_scratch_dir("spark_graft_mvjoin", sf_dir)
    left = TransactionalTable(root + "/orders")
    right = TransactionalTable(root + "/customer")
    view = TransactionalTable(root + "/view")

    def join_fn(l: DataFrame, r: DataFrame) -> DataFrame:
        return l.join(r, l["o_custkey"] == r["c_custkey"]).select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
        )

    if not view.exists():
        o_old = F.pmod(F.col("o_orderkey"), F.lit(10)) < 7
        c_old = F.pmod(F.col("c_custkey"), F.lit(4)) != 0
        left.commit(o.where(o_old))
        right.commit(c.where(c_old))
        refresh_join_view(spark, left, right, view, join_fn)  # bootstrap
        left.commit(o.where(~o_old), mode="append")
        right.commit(c.where(~c_old), mode="append")
        refresh_join_view(spark, left, right, view, join_fn)  # delta append
    return view.read(spark)


@query(
    "q_mv_agg_refresh",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value) + 1e-9, 4) AS sum_value,
           round(min(value) + 1e-9, 4) AS min_value,
           round(max(value) + 1e-9, 4) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def q_mv_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate materialized view maintained through the commit log
    (``operators/mv.py::refresh_agg_view`` — the operator form of
    q_incremental_agg's partial re-aggregation): events is committed in
    two append batches (the %10<7 split), the view bootstraps from
    batch 1's partials, and the second refresh folds ONLY the appended
    delta — read via ``read_appended``'s manifest file-set diff — into
    the |keys|-row state with one monoid merge, replacing the tiny view
    snapshot. The finalized read-back must equal the oracle's full
    recompute over all events: refresh cost scales with the delta, the
    base is never re-scanned, and the recorded base version makes the
    refresh idempotent."""
    from nyc_taxi_etl_pyspark_spark.operators.mv import refresh_agg_view
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    root = fixture_scratch_dir("spark_graft_mvagg", sf_dir)
    base = TransactionalTable(root + "/events")
    view = TransactionalTable(root + "/view")

    def partial_fn(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("__c"),
            F.sum("value").alias("__s"),
            F.min("value").alias("__mn"),
            F.max("value").alias("__mx"),
        )

    def merge_fn(states: DataFrame) -> DataFrame:
        return states.groupBy("event_type").agg(
            F.sum("__c").alias("__c"),
            F.sum("__s").alias("__s"),
            F.min("__mn").alias("__mn"),
            F.max("__mx").alias("__mx"),
        )

    if not view.exists():
        is_old = F.pmod(F.col("event_id"), F.lit(10)) < 7
        base.commit(ev.where(is_old))
        refresh_agg_view(spark, base, view, partial_fn, merge_fn)
        base.commit(ev.where(~is_old), mode="append")
        refresh_agg_view(spark, base, view, partial_fn, merge_fn)
    return view.read(spark).select(
        "event_type",
        F.col("__c").alias("n_events"),
        stable_round(F.col("__s"), 4).alias("sum_value"),
        stable_round(F.col("__mn"), 4).alias("min_value"),
        stable_round(F.col("__mx"), 4).alias("max_value"),
    )


@query(
    "q_tx_change_feed",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0
                  THEN round(o_totalprice * 1.1 + 1e-9, 4)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 != 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', 100.0
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT coalesce(n.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN n.o_orderkey IS NOT NULL
                THEN n.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
           round((CASE WHEN n.o_orderkey IS NOT NULL
                       THEN n.o_totalprice ELSE b.o_totalprice END) + 1e-9, 4)
             AS o_totalprice,
           CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS _change_type
    FROM base b FULL OUTER JOIN new n ON b.o_orderkey = n.o_orderkey
    WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR b.o_orderstatus != n.o_orderstatus
       OR b.o_totalprice != n.o_totalprice
    """,
)
def q_tx_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two committed snapshots (the Delta CDF
    shape, ``txtable.TransactionalTable.changes``): version 0 is the
    orders base, version 1 applies a deterministic update (every 7th
    order re-priced), delete (every 13th order dropped), and insert
    (every 97th order re-keyed); the feed is the full-outer snapshot
    diff on the key, tagged insert/update/delete with new values for
    upserts and old values for deletes. The oracle replays the same
    diff declaratively from the raw table — proving time travel + diff
    against storage, not just the join. Keys both %7- and %13-divisible
    are deletes (the row left the table even though its price would
    also have changed). Idempotent: the two versions are committed once
    per fixture dir and re-read thereafter."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txcdf", sf_dir)
    t = TransactionalTable(root)
    if t.latest_version() < 1:
        if t.latest_version() < 0:
            t.commit(o)
        is_upd = F.col("o_orderkey") % 7 == 0
        new = o.where(F.col("o_orderkey") % 13 != 0).select(
            "o_orderkey",
            F.when(is_upd, F.lit("U")).otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(is_upd, stable_round(F.col("o_totalprice") * 1.1, 4))
            .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        ).unionByName(
            o.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(100.0).alias("o_totalprice"),
            )
        )
        t.commit(new)
    feed = t.changes(spark, ["o_orderkey"], from_version=0, to_version=1)
    return feed.select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
        "_change_type",
    )


@query(
    "q_tx_time_travel",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice + 1e-9, 4) AS price_v0,
           round(o_totalprice * 2 + 1e-9, 4) AS price_v1
    FROM orders
    """,
)
def q_tx_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-pinned snapshot read (time travel) through the commit
    log (``txtable.TransactionalTable.read(version=...)``): version 0
    commits the orders base, version 1 commits a full rewrite with
    every price doubled, and the query joins the PINNED version-0 read
    against the latest read on the key. Matching the oracle (original
    price as ``price_v0``, doubled as ``price_v1``, same row count as
    orders) proves the newer commit did not disturb the older
    snapshot's file set AND that the latest-manifest resolution sees
    the rewrite — the isolation property MERGE/OPTIMIZE rely on when
    readers run concurrently with writers on an object store. The
    reference has no snapshot story at all: every run clobbers the
    curated layer in place (``src/pipeline/etl_writer.py:7-12``).
    Idempotent: versions 0 and 1 are committed once per fixture dir."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txtt", sf_dir)
    t = TransactionalTable(root)
    if t.latest_version() < 1:
        if t.latest_version() < 0:
            t.commit(o)
        t.commit(
            o.select(
                "o_orderkey",
                (F.col("o_totalprice") * 2).alias("o_totalprice"),
            )
        )
    v0 = t.read(spark, version=0).select(
        "o_orderkey",
        stable_round(F.col("o_totalprice"), 4).alias("price_v0"),
    )
    v1 = t.read(spark).select(
        "o_orderkey",
        stable_round(F.col("o_totalprice"), 4).alias("price_v1"),
    )
    return v0.join(v1, "o_orderkey")


@query(
    "q_tx_partition_pruned_read",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice + 1e-9, 4) AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_tx_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metastore-free partition pruning through the manifest
    (``TransactionalTable.read(partitions=...)``): orders is committed
    hive-partitioned on ``o_orderstatus`` (per-file partition values
    ride the manifest), and the read opens ONLY the files whose
    recorded partition value is 'F' — no directory listing, no
    metastore, the manifest IS the partition index. The oracle is the
    plain predicate over the raw table; matching it proves the pruned
    file set is exactly the partition (nothing dropped, nothing
    leaked) and that the hive-encoded partition column reconstructs
    with its original values. At 100 TB this is the read shape for
    date-partitioned corpora: one manifest read plans a scan that
    touches 1 of 10,000 partitions. Idempotent: the partitioned
    snapshot is committed once per fixture dir."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    root = fixture_scratch_dir("spark_graft_txpart", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, partition_by=["o_orderstatus"])
    return t.read(spark, partitions={"o_orderstatus": ["F"]}).select(
        "o_orderkey",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
        "o_orderstatus",
    )


@query(
    "q_tx_stats_skipping_read",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_totalprice >= 900.0 AND o_totalprice <= 50000.0
    """,
)
def q_tx_stats_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest min/max file skipping (``TransactionalTable.read``
    with ``where=``): orders is committed CLUSTERED on ``o_totalprice``
    into 8 range-disjoint files, so the manifest's per-file min/max
    stats exclude every file whose range cannot intersect the band —
    the zone-map shape where a selective range scan on a 100 TB table
    opens a handful of files. The skip is a superset guarantee and the
    residual row filter makes it exact; the oracle is the plain range
    predicate, so matching proves both halves (no file wrongly
    skipped, residual filter exact). Idempotent: the clustered
    snapshot is committed once per fixture dir."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txskip", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_totalprice"], num_files=8)
    return t.read(spark, where=[("o_totalprice", 900.0, 50000.0)]).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_zorder_read",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_totalprice >= 900.0 AND o_totalprice <= 60000.0
      AND o_custkey >= 1 AND o_custkey <= 120
    """,
)
def q_tx_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-clustered commit + two-column zone-map read
    (``commit(zorder_by=[...])`` → ``read(where=[...])``): orders is
    committed on the Morton interleave of (o_totalprice, o_custkey)
    into 16 files, so each file covers a small hyper-rectangle of the
    combined domain and the manifest's min/max stats skip files for
    selective bands on EITHER column — the Delta/Iceberg OPTIMIZE
    ZORDER shape, where a lexicographic sort would only skip on the
    leading column (`test_zorder_commit_skips_on_any_clustered_column`
    pins the asymmetry). The oracle is the plain two-band predicate;
    matching proves the skip + residual filter are exact. Idempotent:
    the Z-ordered snapshot is committed once per fixture dir."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txz", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, zorder_by=["o_totalprice", "o_custkey"], num_files=16)
    return t.read(
        spark,
        where=[("o_totalprice", 900.0, 60000.0), ("o_custkey", 1, 120)],
    ).select(
        "o_orderkey",
        "o_custkey",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_schema_evolution",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice + 1e-9, 4) AS o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus
    FROM orders
    """,
)
def q_tx_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution append (``commit(mode="append",
    allow_schema_evolution=True)`` — Delta's mergeSchema): version 0
    commits the even orders WITHOUT ``o_orderstatus``, version 1
    appends the odd orders WITH it; the manifest schema becomes the
    union, the table is flagged ``mixed_schemas``, and the read merges
    footers so pre-evolution rows surface the new column as NULL. The
    oracle replays the same shape declaratively (status only on odd
    keys); matching proves no column was dropped, no row lost, and the
    NULL-fill landed exactly on the pre-evolution files. Type changes
    never merge (guarded); a full replace homogenizes and clears the
    flag (`test_schema_evolution_append_and_merge_read`). Idempotent:
    both versions are committed once per fixture dir."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders")
    root = fixture_scratch_dir("spark_graft_txevo", sf_dir)
    t = TransactionalTable(root)
    if t.latest_version() < 1:
        if t.latest_version() < 0:
            t.commit(
                o.where(F.col("o_orderkey") % 2 == 0).select(
                    "o_orderkey", "o_totalprice"
                )
            )
        t.commit(
            o.where(F.col("o_orderkey") % 2 == 1).select(
                "o_orderkey", "o_totalprice", "o_orderstatus"
            ),
            mode="append",
            allow_schema_evolution=True,
        )
    return t.read(spark).select(
        "o_orderkey",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
        "o_orderstatus",
    )


@query(
    "q_tx_bloom_point_read",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders WHERE o_orderkey = 7
    """,
)
def q_tx_bloom_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-indexed point lookup (``commit(bloom_by=...)`` →
    ``read(equals=...)``): orders is committed ROUND-ROBIN into 16
    files — every file spans the full key domain, so min/max zone maps
    can prune nothing — with a ~10-bits/key Bloom filter per file on
    ``o_orderkey`` riding the manifest stats; the single-key read
    skips every file whose bloom disproves the key (measured: 1-2 of
    16 opened) and the residual equality filter makes the ~1% false
    positives exact. The single-key fetch shape for a 100 TB unsorted
    table: planning is one manifest read, the scan opens ~1 file. The
    oracle is the plain equality predicate. Idempotent: the indexed
    snapshot is committed once per fixture dir."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txbloom", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o.repartition(16), bloom_by=["o_orderkey"], num_files=16)
    return t.read(spark, equals={"o_orderkey": 7}).select(
        "o_orderkey",
        "o_custkey",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_optimize_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    """,
)
def q_tx_optimize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE round-trip through the commit log: orders is committed
    fragmented (64 small files — the shape streaming appends leave
    behind), compacted by ``TransactionalTable.optimize`` into
    ~target-row files as ONE atomic replace commit, and read back from
    the post-compaction manifest. The oracle is the plain table:
    matching proves compaction moved every row exactly once — no
    dropped file, no double-read — while readers of the pre-compaction
    snapshot stay unaffected (immutable files + retention; raced
    commits retry, `test_optimize_retries_through_a_lost_commit_race`).
    Idempotent: a second optimize on the compacted table rewrites to
    the same content."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txopt", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, num_files=64)
        t.optimize(spark, target_rows_per_file=500_000)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_delete",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE NOT (o_totalprice >= 50000.0 AND o_totalprice <= 150000.0)
    """,
)
def q_tx_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE through the commit-log table
    (``txtable.TransactionalTable.delete``): the orders base is
    committed CLUSTERED on the delete column, so the manifest's min/max
    stats let the delete rewrite only the files that can contain the
    price band — the copy-on-write shape where a selective delete on a
    100 TB table touches a handful of files. The oracle is the plain
    anti-filter over the raw table; matching it proves the rewrite
    dropped exactly the banded rows and the retained files kept
    everything else. Idempotent: re-running deletes nothing (the band
    is already gone) and commits no new version."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txdel", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_totalprice"], num_files=8)
    t.delete(spark, [("o_totalprice", 50000.0, 150000.0)])
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_count_pushdown",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders",
)
def q_tx_count_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT(*) (``TransactionalTable.count``): the row
    total is served from the manifest's maintained per-file counts —
    no data file opened, no Spark job, no scan — the Delta/Iceberg
    SELECT COUNT(*) optimization. The oracle is the actual count over
    the raw table: matching proves the commit arithmetic (staged rows
    on replace, accumulation on append) kept the metadata exact. The
    1-row driver-built frame is the legitimate shape here: the entire
    point is that the answer never touches the cluster."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txcount", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        # two appends so the count exercises the accumulation path
        t.commit(o.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0))
        t.commit(
            o.where(F.pmod(F.col("o_orderkey"), F.lit(2)) != 0), mode="append"
        )
    return spark.createDataFrame([(t.count(),)], "n_rows bigint")


@query(
    "q_tx_time_travel_ts",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 2 = 0
    """,
)
def q_tx_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF time travel (``read(as_of_timestamp=...)``): the
    table is committed in two batches (even keys, then odd appended);
    the query reads AS OF an instant strictly between the two commit
    wall-times — derived from the commit log itself (the midpoint of
    the two recorded ``committed_at`` values), so the resolution is
    reproducible across sessions and scratch reuse — and must see
    exactly the first snapshot. The oracle states that snapshot
    declaratively; matching proves wall-time → version resolution and
    snapshot isolation together."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txasof", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0))
        t.commit(
            o.where(F.pmod(F.col("o_orderkey"), F.lit(2)) != 0), mode="append"
        )
    ts = (
        t.manifest(0)["committed_at"] + t.manifest(1)["committed_at"]
    ) / 2.0
    return t.read(spark, as_of_timestamp=ts).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_restore",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 2 = 0
    """,
)
def q_tx_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE TO VERSION (``TransactionalTable.restore``): a good
    snapshot (even keys), a bad write on top (the odd keys standing in
    for a corrupted batch), then a metadata-only rollback — the restore
    commits one NEW manifest re-listing the good snapshot's immutable
    files, copying zero bytes and running zero Spark jobs, while the
    bad version stays readable for audit until vacuum retires it. The
    oracle states the good snapshot declaratively: matching proves the
    restored head is EXACTLY the pre-incident table through the full
    storage round-trip."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txrestore", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0))
        t.commit(
            o.where(F.pmod(F.col("o_orderkey"), F.lit(2)) != 0), mode="append"
        )
        t.restore(0)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_sql_read",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           round(min(o_totalprice) + 1e-9, 4) AS min_price,
           round(max(o_totalprice) + 1e-9, 4) AS max_price
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0
    GROUP BY o_orderpriority
    """,
)
def q_tx_sql_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL over a transactional table
    (``TransactionalTable.create_view``): the snapshot is registered as
    a temp view with manifest PARTITION PRUNING already applied — the
    view's scan lists only the ``o_orderstatus = 'O'`` partition's
    files (the table-format division of labor: the commit log plans
    files, Catalyst plans rows) — and the query itself is plain
    ``spark.sql`` text (residual filter, aggregate, GROUP BY) whose
    predicates push into that pruned parquet scan. The oracle is the
    same SQL over the raw table, so matching proves the view is
    semantically invisible: nothing dropped by pruning, the hive
    partition column reconstructed, Catalyst composing freely on top.
    min/max aggregates keep the comparison order-insensitive.
    Idempotent: the partitioned snapshot commits once per fixture dir;
    the view re-registers per session (temp views are session state).
    The reference's only SQL surface is a filter string
    (``src/features/transformations.py``); this gives its storage
    layer the full SQL front door."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus"
    )
    root = fixture_scratch_dir("spark_graft_txsql", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, partition_by=["o_orderstatus"])
    view = f"tx_orders_sql_{hashlib.sha256(root.encode()).hexdigest()[:8]}"
    t.create_view(spark, view, partitions={"o_orderstatus": ["O"]})
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(*) AS n_orders,
               round(min(o_totalprice) + 1e-9, 4) AS min_price,
               round(max(o_totalprice) + 1e-9, 4) AS max_price
        FROM {view}
        WHERE o_orderkey % 3 = 0
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_tx_optimize_incremental",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    """,
)
def q_tx_optimize_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental OPTIMIZE (``TransactionalTable.optimize_incremental``
    — the bin-packing compaction that is actually runnable at 100 TB):
    half of orders is committed as ONE near-target file, the other half
    arrives as eight small append fragments (the shape streaming sinks
    leave behind), and the maintenance pass rewrites ONLY the
    fragments — the big file is retained byte-for-byte (key equality
    asserted), so compaction cost is O(small files), never O(table),
    unlike the full re-cluster ``optimize()``. Thresholds derive from
    the table's own row count so the big/small split is identical at
    every SF. The oracle is the plain table: matching proves every
    fragment row moved exactly once and the retained file contributed
    unchanged. Idempotent: compaction runs once per fixture dir."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txoptinc", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        total = o.count()
        half = F.pmod(F.col("o_orderkey"), F.lit(2)) == 0
        t.commit(o.where(half), num_files=1)
        for i in range(8):
            t.commit(
                o.where(
                    ~half & (F.pmod(F.col("o_orderkey"), F.lit(16)) == 2 * i + 1)
                ),
                mode="append",
                num_files=1,
            )
        big = set(t.manifest(0)["files"])
        rep = t.optimize_incremental(
            spark, target_rows_per_file=max(2, int(total * 0.4))
        )
        assert rep["files_rewritten"] == 8, rep
        assert big <= set(t.manifest()["files"]), "big file was rewritten"
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_sql_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             round(o_totalprice * 1.1 + 1e-9, 4) AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', 100.0
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL
                THEN u.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
           round((CASE WHEN u.o_orderkey IS NOT NULL
                       THEN u.o_totalprice ELSE b.o_totalprice END) + 1e-9, 4)
             AS o_totalprice
    FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_tx_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as STATEMENT TEXT (``sources/txsql.py``): the same
    deterministic change set as ``q_tx_table_merge``, but entering
    through the SQL DML front door — ``create_view`` registers the
    table name, the updates ride a temp view, and
    ``execute_dml("MERGE INTO ... USING ... ON t.k = s.k WHEN MATCHED
    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")`` parses the
    statement SHAPE and routes to the transactional ``merge`` operator
    (optimistic concurrency, copy-on-write). The oracle replays the
    merge declaratively, so a hash match proves statement parsing,
    key extraction from the ON condition, and the whole protocol
    round-trip at once. Idempotent: latest-wins with a fixed change
    set is a fixpoint; vacuum bounds retained versions. Completes
    ``q_tx_sql_read``'s SQL *read* front door with SQL *writes* —
    surface the reference (whole-partition overwrite only,
    ``src/pipeline/etl_writer.py:7-12``) never had."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txsqlmerge", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o)
    tag = hashlib.sha256(root.encode()).hexdigest()[:8]
    view, ups = f"tx_sqlmerge_{tag}", f"tx_sqlmerge_ups_{tag}"
    t.create_view(spark, view)  # registers the DML target name too
    o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        stable_round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    ).createOrReplaceTempView(ups)
    execute_dml(
        spark,
        f"""
        MERGE INTO {view} AS t USING {ups} AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    t.vacuum(retain_versions=2)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_sql_update_delete",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN 'U'
                ELSE o_orderstatus END AS o_orderstatus,
           round((CASE WHEN o_orderkey % 7 = 0
                       THEN round(o_totalprice * 1.1 + 1e-9, 4)
                       ELSE o_totalprice END) + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 13 <> 0
    """,
)
def q_tx_sql_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE and DELETE as STATEMENT TEXT (``sources/txsql.py``)
    against a transactional table: both route to copy-on-write
    rewrites (``update_where`` / ``delete_where``) where band/equality
    conjuncts extracted from the WHERE prune files via the manifest's
    zone maps and blooms, and the verbatim predicate stays the exact
    residual — assignment RHS evaluates against the OLD row and is
    cast back to the column's type, NULL-predicate rows are KEPT
    (SQL three-valued logic). The oracle replays both mutations
    declaratively over the raw table (CASE for the update, WHERE NOT
    for the delete). Deterministic across invocations because the
    fixture snapshot is RE-COMMITTED each run before mutating —
    UPDATE is not idempotent, so the run starts from the same base
    every time; vacuum bounds the version history this leaves."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import (
        execute_dml,
        register_dml_target,
    )
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txsqlud", sf_dir)
    t = TransactionalTable(root)
    # fresh base EVERY run; num_files sizes files to the DATA (a few
    # MB of orders ⇒ 8 real files), not to local[32]'s shuffle width —
    # 32 sub-200KB slivers just multiply per-file commit/footer/bloom
    # overhead, here and in both copy-on-write rewrites that inherit
    # the layout (measured 1.9s → 1.3s at sf0.1)
    t.commit(o, cluster_by=["o_orderkey"], num_files=8)
    name = f"tx_sqlud_{hashlib.sha256(root.encode()).hexdigest()[:8]}"
    register_dml_target(name, t)
    execute_dml(
        spark,
        f"UPDATE {name} SET o_orderstatus = 'U', "
        f"o_totalprice = round(o_totalprice * 1.1 + 1e-9, 4) "
        f"WHERE o_orderkey % 7 = 0",
    )
    execute_dml(spark, f"DELETE FROM {name} WHERE o_orderkey % 13 = 0")
    t.vacuum(retain_versions=3)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_sql_ctas",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           round(sum(l_quantity) + 1e-9, 4) AS sum_qty,
           round(max(l_extendedprice) + 1e-9, 4) AS max_price
    FROM lineitem
    WHERE l_orderkey % 5 = 0
    GROUP BY l_returnflag
    """,
)
def q_tx_sql_ctas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE AS SELECT through the SQL front door: CTAS commits
    the query result as v0 of a transactional table PARTITIONED BY the
    flag column (layout v2 — partition values live in the data pages
    AND the shadow hive paths) and registers the name as a pinned view
    + DML target; the returned aggregate then runs as plain SQL over
    that view, so the oracle (the same aggregate over the raw source)
    checks the whole lifecycle — statement parsing, CTAS commit,
    partition layout, view registration, Catalyst pushdown into the
    manifest-planned scan. Idempotent: the fixture commits once per
    sf_dir; later invocations only re-register the view."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import (
        execute_dml,
        register_dml_target,
    )
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ctas_lineitem_src"
    )
    root = fixture_scratch_dir("spark_graft_txctas", sf_dir)
    name = f"tx_ctas_{hashlib.sha256(root.encode()).hexdigest()[:8]}"
    t = TransactionalTable(root)
    if not t.exists():
        escaped = root.replace("'", "''")
        execute_dml(
            spark,
            f"CREATE TABLE {name} LOCATION '{escaped}' "
            f"PARTITIONED BY (l_returnflag) AS "
            f"SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice "
            f"FROM ctas_lineitem_src WHERE l_orderkey % 5 = 0",
        )
    else:
        t.create_view(spark, name)
        register_dml_target(name, t)
    return spark.sql(
        f"""
        SELECT l_returnflag,
               count(*) AS n_items,
               round(sum(l_quantity) + 1e-9, 4) AS sum_qty,
               round(max(l_extendedprice) + 1e-9, 4) AS max_price
        FROM {name}
        GROUP BY l_returnflag
        """
    )


@query(
    "q_tx_sql_time_travel",
    oracle="""
    SELECT 'v0' AS snap, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice) + 1e-9, 4) AS sum_price
    FROM orders WHERE o_orderkey % 3 = 0
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'head' AS snap, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice) + 1e-9, 4) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_tx_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT-level time travel through the SQL front door
    (``sources/txsql.py::execute_sql``): ``<name> VERSION AS OF 0``
    inside plain statement text rewrites to a snapshot-pinned view
    (Delta's SELECT time-travel spelling), so one query aggregates the
    table's FIRST commit (orders with o_orderkey % 3 = 0) and its head
    (that base plus an INSERT INTO append of the rest) side by side.
    The oracle replays both snapshots declaratively from the raw
    orders table: matching proves the travel clause resolved to
    exactly the v0 file list while the head view saw the append —
    MVCC isolation expressed in SQL. Fixture commits once per sf_dir
    (both mutations are idempotent-guarded), so any run sees the same
    two snapshots. TIMESTAMP AS OF and travel inside DML source
    queries are pinned in tests/test_txtable.py."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_sql
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txsqltt", sf_dir)
    name = f"tx_sqltt_{hashlib.sha256(root.encode()).hexdigest()[:8]}"
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o.filter(F.col("o_orderkey") % 3 == 0))
        o.filter(F.col("o_orderkey") % 3 != 0).createOrReplaceTempView(
            f"{name}_rest"
        )
        t.create_view(spark, name)  # registers the DML target name
        execute_sql(
            spark, f"INSERT INTO {name} SELECT * FROM {name}_rest"
        )
    t.create_view(spark, name)  # re-pin at the head for this session
    return execute_sql(
        spark,
        f"""
        SELECT 'v0' AS snap, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice) + 1e-9, 4) AS sum_price
        FROM {name} VERSION AS OF 0
        GROUP BY o_orderstatus
        UNION ALL
        SELECT 'head' AS snap, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice) + 1e-9, 4) AS sum_price
        FROM {name}
        GROUP BY o_orderstatus
        """,
    )


@query(
    "q_tx_sql_alter",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice,
           CASE WHEN o_orderkey % 4 = 0
                THEN round(o_totalprice * 0.05 + 1e-9, 4) END AS surcharge
    FROM orders
    """,
)
def q_tx_sql_alter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD COLUMNS through the SQL front door, then DML on
    the new column: the fixture commits orders, widens it with a
    SCHEMA-ONLY commit (``add_columns`` — zero files rewritten, O(1)
    delta record), and a copy-on-write UPDATE fills the column for a
    quarter of the rows; rows the rewrite never touched surface it as
    a typed NULL via ``_reconcile_schema``. The oracle replays the
    whole lifecycle declaratively (CASE for the filled quarter, NULL
    elsewhere): matching proves the widened schema, the NULL fill on
    pre-ALTER files, and the UPDATE's targeting all at once.
    Idempotent: the mutations are version-guarded AND the UPDATE's
    RHS is a pure function of an unchanged column, so any run
    converges to the same head."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import (
        execute_sql,
        register_dml_target,
    )
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txsqlalter", sf_dir)
    name = f"tx_alter_{hashlib.sha256(root.encode()).hexdigest()[:8]}"
    t = TransactionalTable(root)
    register_dml_target(name, t)
    if not t.exists():
        t.commit(o, cluster_by=["o_orderkey"], num_files=8)
    if t.latest_version() < 1:
        execute_sql(
            spark, f"ALTER TABLE {name} ADD COLUMNS (surcharge double)"
        )
    if t.latest_version() < 2:
        execute_sql(
            spark,
            f"UPDATE {name} SET surcharge = "
            f"round(o_totalprice * 0.05 + 1e-9, 4) "
            f"WHERE o_orderkey % 4 = 0",
        )
    return execute_sql(
        spark,
        f"""
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-9, 4) AS o_totalprice,
               round(surcharge + 1e-9, 4) AS surcharge
        FROM {name}
        """,
    )


@query(
    "q_tx_sql_merge_full",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), src AS (
      SELECT o_orderkey, 'M' AS o_orderstatus,
             CASE WHEN o_orderkey % 21 = 0 THEN -1.0
                  ELSE round(o_totalprice * 0.5 + 1e-9, 4)
             END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'NEWROW', 55.5
      FROM orders WHERE o_orderkey % 97 = 0
    ), j AS (
      SELECT b.o_orderkey AS bk, s.o_orderkey AS sk,
             b.o_orderstatus AS bst, s.o_orderstatus AS sst,
             b.o_totalprice AS bp, s.o_totalprice AS sp
      FROM base b FULL OUTER JOIN src s ON b.o_orderkey = s.o_orderkey
    )
    SELECT coalesce(bk, sk) AS o_orderkey,
           CASE WHEN bk IS NOT NULL AND sk IS NOT NULL THEN sst
                WHEN bk IS NULL THEN lower(sst)
                WHEN bk % 11 = 0 THEN 'Z'
                ELSE bst END AS o_orderstatus,
           round((CASE WHEN bk IS NOT NULL AND sk IS NOT NULL
                       THEN round(bp + sp + 1e-9, 4)
                       WHEN bk IS NULL THEN sp
                       ELSE bp END) + 1e-9, 4) AS o_totalprice
    FROM j
    WHERE NOT (bk IS NOT NULL AND sk IS NOT NULL AND sp < 0)
      AND NOT (bk IS NULL AND sk % 2 <> 0)
    """,
)
def q_tx_sql_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-FORM MERGE INTO as statement text — the clause shapes every
    Delta/Iceberg MERGE user actually writes, which the round-6 front
    door rejected (upsert-all regex only, the round-6 verdict's #1
    gap): conditional ``WHEN MATCHED AND <cond> THEN DELETE``, a
    second ``WHEN MATCHED THEN UPDATE SET col = expr`` with
    expressions over BOTH sides (``t.`` + ``s.``), a conditional
    column-list ``WHEN NOT MATCHED ... INSERT (cols) VALUES (exprs)``,
    and ``WHEN NOT MATCHED BY SOURCE THEN UPDATE`` — all compiled by
    ``operators/merge.py:merge_clauses`` into ONE full-outer join
    whose clause conditions are CASE arms (single shuffle, no
    per-clause joins, no UDFs; the small change set broadcasts under
    AQE at scale). First-match-wins clause order and the SQL-standard
    cardinality check are enforced. The oracle replays the entire
    clause cascade declaratively in DuckDB over the same full-outer
    join, so a hash match proves clause parsing, alias
    canonicalization, per-group condition routing, expression
    rewriting onto both join sides, and the transactional
    read-merge-commit round-trip at once. The fixture re-commits its
    base every run (a conditional UPDATE adding ``s`` deltas is not
    idempotent); vacuum bounds the versions this leaves."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txsqlmergefull", sf_dir)
    t = TransactionalTable(root)
    # fresh base EVERY run: the matched-update arm adds the source
    # delta to the stored price, so the statement is not idempotent
    t.commit(o, cluster_by=["o_orderkey"], num_files=8)
    tag = hashlib.sha256(root.encode()).hexdigest()[:8]
    view, ups = f"tx_mergefull_{tag}", f"tx_mergefull_src_{tag}"
    t.create_view(spark, view)  # registers the DML target name too
    o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("M").alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 21 == 0, F.lit(-1.0))
        .otherwise(stable_round(F.col("o_totalprice") * 0.5, 4))
        .alias("o_totalprice"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("NEWROW").alias("o_orderstatus"),
            F.lit(55.5).alias("o_totalprice"),
        )
    ).createOrReplaceTempView(ups)
    execute_dml(
        spark,
        f"""
        MERGE INTO {view} AS t USING {ups} AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.o_totalprice < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET
            o_orderstatus = s.o_orderstatus,
            o_totalprice = round(t.o_totalprice + s.o_totalprice + 1e-9, 4)
        WHEN NOT MATCHED AND s.o_orderkey % 2 = 0 THEN
            INSERT (o_orderkey, o_orderstatus, o_totalprice)
            VALUES (s.o_orderkey, lower(s.o_orderstatus), s.o_totalprice)
        WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 11 = 0 THEN
            UPDATE SET o_orderstatus = 'Z'
        """,
    )
    t.vacuum(retain_versions=2)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_delete_dv",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE NOT (o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
               AND o_orderstatus = 'O')
    """,
)
def q_tx_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors
    (``TransactionalTable.delete_where(..., merge_on_read=True)``): the
    same selective delete as ``q_tx_delete``, but instead of rewriting
    the matched files the commit writes ONE ``_dvs/`` position sidecar
    and a stats delta — O(deleted positions), never O(matched file
    bytes); readers subtract the vector with a broadcast anti-join on
    (file, ``_metadata.row_index``). The query ASSERTS
    ``files_rewritten == 0`` (the whole point of the strategy) and the
    oracle is the plain anti-filter: matching proves soft-deleted rows
    vanish from reads exactly as a copy-on-write delete's would, while
    every data file stays byte-identical. Idempotent: a re-run matches
    only live rows (none remain) and commits nothing."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txdvdel", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_totalprice"], num_files=8)
    res = t.delete_where(
        spark,
        "o_totalprice >= 50000.0 AND o_totalprice <= 150000.0 "
        "AND o_orderstatus = 'O'",
        merge_on_read=True,
    )
    assert res["files_rewritten"] == 0, res  # merge-on-read contract
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_update_dv",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' AND o_totalprice < 50000.0
                THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    """,
)
def q_tx_update_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE via deletion vectors
    (``update_where(..., merge_on_read=True)``): the matched rows' old
    positions are soft-deleted through a ``_dvs/`` sidecar and the
    updated rows re-enter the table as APPENDED files — no matched
    file is rewritten (asserted), the Delta DV-update shape whose cost
    is O(matched rows). The assignment is absolute and its predicate
    self-extinguishes ('F' rows become 'R'), so a re-run matches
    nothing and commits no version; the oracle replays the update as a
    CASE projection over the raw table."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txdvupd", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_totalprice"], num_files=8)
    res = t.update_where(
        spark,
        {"o_orderstatus": "'R'"},
        "o_orderstatus = 'F' AND o_totalprice < 50000.0",
        merge_on_read=True,
    )
    assert res["files_rewritten"] == 0, res  # merge-on-read contract
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_partition_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_orderkey % 4 AS BIGINT) AS bucket, o_totalprice
      FROM orders
    ), appended AS (
      SELECT o_orderkey + 10000000, 'N',
             CAST((o_orderkey + 10000000) % 4 AS BIGINT), o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
    ), all_rows AS (
      SELECT * FROM base UNION ALL SELECT * FROM appended
    )
    SELECT o_orderkey, o_orderstatus, bucket,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM all_rows WHERE bucket IN (0, 1)
    """,
)
def q_tx_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION EVOLUTION (``alter_partitioning`` — Iceberg's
    metadata-only re-partitioning): the fixture commits partitioned by
    ``o_orderstatus``, evolves to partition by ``bucket`` through the
    SQL front door (``ALTER TABLE t PARTITIONED BY (bucket)`` — zero
    files rewritten, asserted), appends new rows under the NEW scheme,
    and returns a partition-scoped read on the new column over the
    MIXED snapshot. Old files don't record ``bucket`` so metadata
    pruning keeps them and the exact residual filter applies; new
    files prune by their recorded values — the oracle (a plain WHERE
    over base ∪ appended) proves the mixed-scheme read loses and
    invents nothing."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_orderkey") % 4).cast("bigint").alias("bucket"),
        "o_totalprice",
    )
    root = fixture_scratch_dir("spark_graft_txpartevo", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, partition_by=["o_orderstatus"])
        files0 = set(t.manifest()["files"])
        res = execute_dml(
            spark, "ALTER TABLE evo_t PARTITIONED BY (bucket)", {"evo_t": t}
        )
        assert res["partition_by"] == ["bucket"], res
        assert set(t.manifest()["files"]) == files0  # metadata-only
        t.commit(
            o.where(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                ((F.col("o_orderkey") + 10000000) % 4)
                .cast("bigint")
                .alias("bucket"),
                "o_totalprice",
            ),
            mode="append",
            partition_by=["bucket"],
        )
    return t.read(spark, partitions={"bucket": [0, 1]}).select(
        "o_orderkey",
        "o_orderstatus",
        "bucket",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_merge_dv",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             round(o_totalprice * 1.1 + 1e-9, 4) AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', 100.0
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL
                THEN u.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
           round((CASE WHEN u.o_orderkey IS NOT NULL
                       THEN u.o_totalprice ELSE b.o_totalprice END) + 1e-9, 4)
             AS o_totalprice
    FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_tx_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE via deletion vectors
    (``TransactionalTable.merge(..., merge_on_read=True)`` →
    ``_dv_merge``): the exact change set and oracle of
    ``q_tx_table_merge``, but the matched target positions are
    soft-deleted through ONE ``_dvs/`` sidecar and the merge output
    rows APPEND — zero files rewritten (asserted from the committed
    manifest), so a small CDC batch against a wide table writes
    O(batch) bytes where even the touched-file copy-on-write path
    rewrites whole files. Matching the full-outer-join oracle proves
    the DV route is result-identical to copy-on-write MERGE.
    Deterministic across re-runs (latest-wins on a fixed change set is
    a fixpoint; each run stacks a new DV + appends, vacuum bounds the
    versions)."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txdvmerge", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_orderkey"], num_files=8)
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        stable_round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    t.merge(spark, updates, ["o_orderkey"], merge_on_read=True)
    m = t.manifest()
    assert m["meta"].get("strategy") == "merge-on-read", m["meta"]
    t.vacuum(retain_versions=2)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_merge_dv_clauses",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN 'M'
                ELSE o_orderstatus END AS o_orderstatus,
           round(CASE WHEN o_orderkey % 7 = 0
                      THEN round(o_totalprice * 1.1 + 1e-9, 4)
                      ELSE o_totalprice END + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 14 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000 AS o_orderkey, 'N' AS o_orderstatus,
           100.0 AS o_totalprice
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def q_tx_merge_dv_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLAUSE-FORM merge-on-read MERGE through the SQL front door
    (round-8 verdict #4 — the last copy-on-write-only mutation shape):
    ``MERGE /*+ MERGE_ON_READ */ INTO ... WHEN MATCHED AND <cond>
    THEN DELETE / WHEN MATCHED AND <cond> THEN UPDATE SET ... / WHEN
    NOT MATCHED AND <cond> THEN INSERT *`` routes through
    ``operators/merge.py:merge_clauses_decomposed`` →
    ``TransactionalTable._dv_merge_clauses``: the fired matched
    clauses become ONE ``_dvs/`` position sidecar + a CASE-projected
    append, "keep" rows' files stay byte-identical, and the commit is
    O(matched + inserts) — never O(touched file bytes). The oracle
    replays the clause cascade declaratively, so a hash match proves
    the decomposition is result-identical to the copy-on-write clause
    rewrite. The clause conditions make the statement a FIXPOINT
    (delete/update arms exclude inserted keys; the insert arm excludes
    update keys), so re-runs stack idempotent DVs+appends; vacuum
    bounds the versions."""
    import hashlib

    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txdvmergeclauses", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_orderkey"], num_files=8)
    tag = hashlib.sha256(root.encode()).hexdigest()[:8]
    view, ups = f"tx_dvmc_{tag}", f"tx_dvmc_src_{tag}"
    t.create_view(spark, view)
    o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("M").alias("o_orderstatus"),
        stable_round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    ).createOrReplaceTempView(ups)
    res = execute_dml(
        spark,
        f"""
        MERGE /*+ MERGE_ON_READ */ INTO {view} AS t USING {ups} AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_orderkey % 14 = 0
            AND t.o_orderkey < 10000000 THEN DELETE
        WHEN MATCHED AND t.o_orderkey < 10000000 THEN UPDATE SET
            o_orderstatus = s.o_orderstatus,
            o_totalprice = s.o_totalprice
        WHEN NOT MATCHED AND s.o_orderkey >= 10000000 THEN INSERT *
        """,
    )
    m = t.manifest()
    assert m["meta"].get("strategy") == "merge-on-read", m["meta"]
    assert res["op"] == "merge" and res.get("clauses"), res
    t.vacuum(retain_versions=2)
    return t.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_clone_shallow",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN 'C'
                ELSE o_orderstatus END AS o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    """,
)
def q_tx_clone_shallow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE through the SQL front door (``CREATE TABLE ...
    SHALLOW CLONE`` — Delta's clone; ``TransactionalTable.clone_from``):
    the clone is an O(metadata) commit whose manifest BORROWS the
    source snapshot's data files (absolutized keys, zero bytes
    copied), then a copy-on-write UPDATE mutates the CLONE — touched
    foreign files rewrite locally, untouched ones stay byte-identical
    in the source's root — while the SOURCE is asserted unchanged.
    The oracle replays source ∘ update declaratively, so a hash match
    proves the borrowed-file read path (stats, blooms, pruning, the
    foreign-key scan mapping) end to end. Idempotent: the clone and
    its one mutation commit once per fixture (keyed on the manifest
    op, self-healing after a mid-fixture crash); re-runs only read."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src_root = fixture_scratch_dir("spark_graft_txclonesrc", sf_dir)
    src = TransactionalTable(src_root)
    if not src.exists():
        src.commit(o, cluster_by=["o_orderkey"], num_files=8)
    n_src = src.count()
    dst_root = fixture_scratch_dir("spark_graft_txclonedst", sf_dir)
    dst = TransactionalTable(dst_root)
    if not dst.exists():
        res = execute_dml(
            spark,
            f"CREATE TABLE clone_t LOCATION '{dst_root}' "
            "SHALLOW CLONE clone_src",
            {"clone_src": src},
        )
        assert res["op"] == "clone", res
        m = dst.manifest()
        assert m["meta"]["op"] == "clone", m["meta"]
        # zero data bytes copied at clone time
        assert dst.storage.list("data") == [], "clone copied data files"
    if dst.manifest()["meta"].get("op") == "clone":
        # the mutation runs once per fixture (the predicate hits every
        # id-clustered file — re-running the copy-on-write rewrite per
        # invocation would rewrite the whole table for an identical
        # result), keyed on the MANIFEST op rather than the exists
        # guard so a process that died between the clone commit and
        # this one self-heals instead of poisoning the fixture
        dst.update_where(
            spark, {"o_orderstatus": "'C'"}, "o_orderkey % 5 = 0"
        )
        dst.vacuum(retain_versions=2)
    # the source is untouched by the clone's mutation
    assert src.count() == n_src, (src.count(), n_src)
    return dst.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_clone_deep",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 7 != 0
    """,
)
def q_tx_clone_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEEP CLONE through the SQL front door (``CREATE TABLE ... DEEP
    CLONE`` — round-10 verdict #6, ``clone_from(deep=True)``): every
    source data file and bloom sidecar is COPIED under the clone's
    root (deterministic destination keys, resume-safe, hard-linked on
    the POSIX backend) before the single manifest commit, so the clone
    is SELF-CONTAINED from version 0. The query then VACUUMS THE
    SOURCE TO ZERO RETENTION — the exact operation that breaks a
    shallow clone's borrowed files — deletes every 7th order on the
    clone, and reads it back. The oracle replays declaratively
    (orders minus the deleted keys); a hash match proves the copied
    files, stats, and blooms survive the source's full lifecycle
    independently. Idempotent per fixture, mutation keyed on the
    manifest op (self-healing, same discipline as the shallow twin)."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src_root = fixture_scratch_dir("spark_graft_txdcsrc", sf_dir)
    src = TransactionalTable(src_root)
    if not src.exists():
        src.commit(
            o, cluster_by=["o_orderkey"], num_files=8,
            bloom_by=["o_orderkey"],
        )
    dst_root = fixture_scratch_dir("spark_graft_txdcdst", sf_dir)
    dst = TransactionalTable(dst_root)
    if not dst.exists():
        res = execute_dml(
            spark,
            f"CREATE TABLE dclone_t LOCATION '{dst_root}' "
            "DEEP CLONE dclone_src",
            {"dclone_src": src},
        )
        assert res["clone_kind"] == "deep", res
        m = dst.manifest()
        # self-contained: every manifest key is the clone's own
        assert all(not k.startswith("/") for k in m["files"]), m["files"]
    if dst.manifest()["meta"].get("op") == "clone":
        # the shallow-breaking operation: reclaim every source file the
        # head no longer needs after a truncating replace — harmless
        # here because the deep clone owns copies (hard links keep the
        # bytes alive even as the source's names disappear)
        src.commit(src.read(spark).limit(0), mode="replace")
        src.vacuum(retain_versions=1, unreferenced_grace_s=0)
        dst.delete_where(spark, "o_orderkey % 7 = 0", merge_on_read=True)
    return dst.read(spark).select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


@query(
    "q_tx_rename_drop_column",
    oracle="""
    SELECT o_orderkey, round(o_totalprice + 1e-9, 4) AS price
    FROM orders
    UNION ALL
    SELECT o_orderkey + 70000000,
           round(o_totalprice * 2 + 1e-9, 4) AS price
    FROM orders WHERE o_orderkey % 5 = 0
    """,
)
def q_tx_rename_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME / DROP COLUMN via column mapping (round 10 —
    ``txtable.rename_column``/``drop_column`` through the SQL front
    door, Delta's name-mapping mode): both are METADATA-ONLY commits
    (the physical parquet name never changes). The fixture commits
    orders, RENAMES ``o_totalprice`` → ``price``, APPENDS a derived
    batch under the NEW name (staged back to the physical name, so
    old and new files share one page schema), then DROPS
    ``o_orderstatus``. The read must show exactly (o_orderkey, price)
    with values from both sides of the rename; the oracle replays
    declaratively. Dropped-name tombstones, pruning/DML/clone/restore/
    streaming behavior across renames are pinned in
    tests/test_txtable_columns.py."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txrencol", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_orderkey"], bloom_by=["o_orderkey"])
        execute_dml(
            spark,
            "ALTER TABLE t RENAME COLUMN o_totalprice TO price",
            tables={"t": t},
        )
        t.commit(
            o.filter(F.col("o_orderkey") % 5 == 0).select(
                (F.col("o_orderkey") + 70000000).alias("o_orderkey"),
                F.col("o_orderstatus"),
                (F.col("o_totalprice") * 2).alias("price"),
            ),
            mode="append",
        )
        execute_dml(
            spark,
            "ALTER TABLE t DROP COLUMN o_orderstatus",
            tables={"t": t},
        )
    return t.read(spark).select(
        "o_orderkey", stable_round(F.col("price"), 4).alias("price")
    )


@query(
    "q_tx_generated_column",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice + 1e-9, 4) AS o_totalprice,
           round(o_totalprice * 0.1 + 1e-9, 4) AS tax
    FROM orders
    UNION ALL
    SELECT o_orderkey + 90000000,
           round(o_totalprice * 3 + 1e-9, 4) AS o_totalprice,
           round(o_totalprice * 3 * 0.1 + 1e-9, 4) AS tax
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def q_tx_generated_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS columns (round 10 —
    ``txtable.add_generated_column`` via the SQL front door's ``ALTER
    TABLE ... ADD COLUMN tax double GENERATED ALWAYS AS (expr)``): a
    schema-only commit. PRE-ALTER rows compute the expression at read
    (``coalesce(physical, expr)`` — exact because every write is gated
    on physical == expr), an APPEND omitting the column derives it at
    write, and a violating append (wrong explicit value) rejects
    whole — asserted in-body. The oracle replays both row populations
    declaratively with the identical expression; UPDATE re-derivation,
    restore/clone travel, and the rename/drop guards are pinned in
    tests/test_txtable_columns.py."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        ConstraintViolation,
        TransactionalTable,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txgencol", sf_dir)
    t = TransactionalTable(root)
    if not t.exists():
        t.commit(o, cluster_by=["o_orderkey"])
        execute_dml(
            spark,
            "ALTER TABLE t ADD COLUMN tax double GENERATED ALWAYS AS "
            "(o_totalprice * 0.1)",
            tables={"t": t},
        )
        t.commit(  # derived at write (column omitted)
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + 90000000).alias("o_orderkey"),
                (F.col("o_totalprice") * 3).alias("o_totalprice"),
            ),
            mode="append",
        )
        bad = spark.createDataFrame(
            [(999999999, 10.0, 77.0)],
            "o_orderkey bigint, o_totalprice double, tax double",
        )
        try:
            t.commit(bad, mode="append")
        except ConstraintViolation:
            pass
        else:  # pragma: no cover - the gate failing IS the bug
            raise RuntimeError(
                "generated-column gate accepted a violating append"
            )
    return t.read(spark).select(
        "o_orderkey",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
        stable_round(F.col("tax"), 4).alias("tax"),
    )


@query(
    "q_tx_sql_alter_widen",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CASE WHEN o_orderstatus = 'O' AND o_orderkey % 13 = 0
                THEN 'W' ELSE o_orderstatus END AS o_orderstatus,
           round(o_totalprice + 1e-9, 4) AS o_totalprice
    FROM orders
    UNION ALL
    SELECT CAST(o_orderkey + 10000000 AS BIGINT), 'N',
           round(o_totalprice + 1e-9, 4)
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
)
def q_tx_sql_alter_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE type WIDENING through the SQL front door
    (``ALTER TABLE t ALTER COLUMN c TYPE bigint`` →
    ``TransactionalTable.alter_column_type``): the table is committed
    with a NARROW int key, widened to bigint as a SCHEMA-ONLY commit
    (zero files rewritten, zero Spark jobs — the parquet reader
    upcasts narrow files on scan via the explicit manifest schema),
    then an append lands WIDE rows and a self-extinguishing UPDATE
    rewrites across the mixed narrow+wide files. The oracle replays
    all of it declaratively with a CAST: matching proves the widened
    reads, the mixed-file rewrite, and the post-widen append agree
    bit-for-bit with the declared type. Idempotent: reruns find no 'O'
    rows at the updated keys and commit nothing."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = fixture_scratch_dir("spark_graft_txwiden", sf_dir)
    t = TransactionalTable(root)
    tables = {"widen_t": t}
    if not t.exists():
        t.commit(
            o.select(
                F.col("o_orderkey").cast("int").alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            ),
            num_files=4,
        )
        res = execute_dml(
            spark, "ALTER TABLE widen_t ALTER COLUMN o_orderkey TYPE bigint",
            tables,
        )
        assert res["type"] == "bigint", res
        t.commit(
            o.where(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice",
            ),
            mode="append",
        )
    execute_dml(
        spark,
        "UPDATE widen_t SET o_orderstatus = 'W' "
        "WHERE o_orderstatus = 'O' AND o_orderkey % 13 = 0",
        tables,
    )
    out = t.read(spark)
    assert dict(out.dtypes)["o_orderkey"] == "bigint"
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )
