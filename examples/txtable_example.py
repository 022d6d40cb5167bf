#!/usr/bin/env python
"""The transactional-lakehouse workflow, end to end — the round-4
storage layer (sources/txtable.py) as a user would drive it against a
table that lives where the reference actually stores data (an object
store, ``/root/reference/src/gcs/paths.py:1-4``): every mutation is one
atomic manifest commit, so concurrent readers never observe a partial
table and there is no rename anywhere on the path.

Flow:

1. CREATE   — initial partitioned commit of the curated taxi layer
2. APPEND   — a second day lands (schema-guarded)
3. INCREMENT— run_etl_incremental(table_format="tx"): new dates only,
              one transactional dynamic-partition-overwrite per batch
4. MERGE    — a CDC correction batch upserts rows by key
5. DELETE   — copy-on-write row deletion, file-pruned from the manifest
6. OPTIMIZE — compact small files within partitions, layout preserved
7. READ     — snapshot reads, time travel, manifest-stats file skipping,
              exact partition pruning, and the change data feed
8. HISTORY / VACUUM — audit trail; reclaim unreferenced files

Run: python examples/txtable_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.etl import hourly_agg_from_state, run_etl_incremental
from nyc_taxi_etl_pyspark_spark.session import get_spark
from nyc_taxi_etl_pyspark_spark.sources.txtable import (
    ObjectStoreSimStorage,
    TransactionalTable,
    prune_files,
)


def synth_taxi(spark, n: int):
    return spark.range(n).select(
        (F.col("id") % 7 - 1).cast("int").alias("payment_type"),
        F.timestamp_seconds(F.lit(1420070400) + F.col("id") * 180).alias(
            "tpep_pickup_datetime"
        ),
        F.timestamp_seconds(
            F.lit(1420070400) + F.col("id") * 180 + (F.col("id") % 200) * 66
        ).alias("tpep_dropoff_datetime"),
        ((F.col("id") % 50).cast("double") / 10.0 - 0.4).alias("trip_distance"),
        ((F.col("id") % 90).cast("double") - 2.0).alias("fare_amount"),
        ((F.col("id") % 95).cast("double") - 1.0).alias("total_amount"),
        (F.col("id") % 8 - 1).cast("int").alias("passenger_count"),
        (F.lit(-74.35) + (F.col("id") % 100).cast("double") / 125.0).alias(
            "pickup_longitude"
        ),
        (F.lit(40.45) + (F.col("id") % 60).cast("double") / 100.0).alias(
            "pickup_latitude"
        ),
        (F.lit(-74.25) + (F.col("id") % 80).cast("double") / 100.0).alias(
            "dropoff_longitude"
        ),
        (F.lit(40.55) + (F.col("id") % 40).cast("double") / 80.0).alias(
            "dropoff_latitude"
        ),
    )


def main() -> None:
    spark = get_spark(app_name="txtable-example")
    root = tempfile.mkdtemp(prefix="lake-")
    curated, agg = os.path.join(root, "curated"), os.path.join(root, "agg")

    # ------------------------------------------------------------------
    # 1-3. Incremental, transactional ingestion: two date-aligned
    # batches land; each is ONE atomic replace_partitions commit. The
    # "which dates are already curated" question is answered from one
    # manifest read — no directory listing, no metastore. The storage
    # backend here is the object-store simulator (atomic PUT, no
    # rename) to make the deployment claim honest.
    raw = synth_taxi(spark, 25_000)
    pick = F.to_date("tpep_pickup_datetime")
    batches = [
        raw.filter(pick < "2015-01-15"),
        raw.filter(pick >= "2015-01-15"),
    ]
    for i, batch in enumerate(batches, 1):
        stats = run_etl_incremental(spark, batch, curated, agg, table_format="tx")
        print(f"batch {i}: {stats['rows_new']} rows, "
              f"{len(stats['dates_new'])} new dates")
    replay = run_etl_incremental(spark, batches[1], curated, agg, table_format="tx")
    print("redelivered batch no-ops:", replay)

    table = TransactionalTable(curated, storage=ObjectStoreSimStorage(curated))
    v_before_merge = table.latest_version()
    print("curated rows:", table.read(spark).count(),
          "versions:", table.versions())

    # ------------------------------------------------------------------
    # 4. CDC correction: a small change set (fare corrections for one
    # date) merges by key with optimistic concurrency — latest wins,
    # everything else passes through untouched, one commit.
    day = table.read(spark, partitions={"pickup_date": ["2015-01-10"]})
    fixes = (
        day.limit(20)
        .withColumn("total_amount", F.col("total_amount") + 100.0)
        .select(*day.columns)
    )
    table.merge(spark, fixes, key_cols=["tpep_pickup_datetime", "pickup_longitude"])
    print("after merge:", table.read(spark).count(), "rows,",
          "history head:", table.history()[0]["meta"])

    # ------------------------------------------------------------------
    # 5. DELETE: purge one bad ingest day (GDPR-style removal). The
    # delete column must align with the physical layout for the
    # manifest to prune: pickup timestamps are day-clustered by the
    # date partitioning, so stats prove 51 of 52 files can't match and
    # copy-on-write rewrites ONLY that day's file. (An unclustered
    # column, e.g. trip_distance, would make every file a candidate —
    # clustering IS the skip; see test_cluster_by_commit_enables_
    # stats_skipping.)
    dstats = table.delete(
        spark,
        [("tpep_pickup_datetime", "2015-01-05 00:00:00", "2015-01-05 23:59:59")],
    )
    print(f"delete: {dstats['rows_deleted']} rows, rewrote "
          f"{dstats['files_rewritten']} files, retained "
          f"{dstats['files_retained']}")

    # ------------------------------------------------------------------
    # 6. OPTIMIZE, both tiers. Routine maintenance is INCREMENTAL:
    # rewrite only the sub-threshold fragments the per-batch appends
    # left behind (per-partition bin-packing, O(small files) — the only
    # form of OPTIMIZE runnable as a cron job on a huge table); the
    # FULL optimize remains the occasional re-cluster that restores
    # globally disjoint zone-map ranges. Readers of the pre-compaction
    # snapshot are unaffected (immutable files + retention); either
    # compaction commit loses any race to a concurrent writer and
    # retries against the new snapshot.
    # simulate the fragment drip a micro-batching sink leaves behind:
    # three tiny appends landing in one (new) date partition. The rows
    # are a time-shifted synthetic slice — the point is the FILE shape.
    drip_src = (
        table.read(spark, partitions={"pickup_date": ["2015-01-20"]})
        .limit(40)
        .withColumn(
            "tpep_pickup_datetime",
            F.col("tpep_pickup_datetime") + F.expr("INTERVAL 60 DAYS"),
        )
    )
    drip_src = drip_src.withColumn(
        "pickup_date", F.to_date("tpep_pickup_datetime")
    )
    for _ in range(3):
        table.commit(drip_src, mode="append", num_files=1)
    istats = table.optimize_incremental(spark, target_rows_per_file=500_000)
    print("incremental optimize:", istats["files_rewritten"], "fragments ->",
          f"{istats['rows_compacted']} rows repacked,",
          istats["files_retained"], "files untouched")
    ostats = table.optimize(spark)
    print("optimize:", ostats["files_before"], "->", ostats["files_after"], "files")

    # ------------------------------------------------------------------
    # 7. Reads: current snapshot, time travel, partition pruning, and
    # manifest-stats file skipping for a selective range.
    m = table.manifest()
    # footer min/max skipping: the date-partitioned layout makes each
    # file's pickup-timestamp range one day wide, so a 3-day window
    # excludes almost every file from the manifest alone. (A column
    # uncorrelated with the layout, e.g. trip_distance, spans its full
    # domain in every file — nothing to skip; clustering IS the skip.)
    week = [("tpep_pickup_datetime", "2015-01-10 00:00:00", "2015-01-12 23:59:59")]
    kept = prune_files(m, week)
    print(f"stats skipping: {len(kept)}/{len(m['files'])} files for a "
          f"3-day pickup window -> {table.read(spark, where=week).count()} rows")
    one_day = table.read(spark, partitions={"pickup_date": ["2015-01-20"]})
    print("partition-pruned day:", one_day.count(), "rows")
    print("time travel to pre-merge version:",
          table.read(spark, version=v_before_merge).count(), "rows")

    # SQL front door: register a (pruned, version-pinned) snapshot as a
    # temp view — the commit log plans the FILES (partition pruning
    # here), Catalyst plans the ROWS (the GROUP BY below, with its own
    # predicate pushdown into the pruned parquet scan).
    table.create_view(
        spark, "curated_day", partitions={"pickup_date": ["2015-01-20"]}
    )
    top_hour = spark.sql(
        """
        SELECT hour(tpep_pickup_datetime) AS h, count(*) AS trips
        FROM curated_day GROUP BY 1 ORDER BY trips DESC LIMIT 1
        """
    ).first()
    print(f"sql over tx view: busiest hour {top_hour.h} ({top_hour.trips} trips)")

    # the hourly aggregate state table is transactional too
    agg_t = TransactionalTable(agg)
    print("hourly agg rows:", hourly_agg_from_state(agg_t.read(spark)).count())

    # change data feed: what did the merge+delete window change? One
    # full-outer snapshot diff, keyed — the sync feed for downstream
    # consumers (index refresh, cache invalidation).
    feed = table.changes(
        spark,
        ["tpep_pickup_datetime", "pickup_longitude"],
        from_version=v_before_merge,
    )
    by_type = {r["_change_type"]: r["n"] for r in feed.groupBy(
        "_change_type"
    ).agg(F.count("*").alias("n")).collect()}
    print("change feed since pre-merge:", by_type)

    # ------------------------------------------------------------------
    # 8. Schema evolution: a new ingest source starts carrying
    # tip_amount. The append merges the column into the table schema
    # (types can never change — guarded); pre-evolution files surface
    # it as NULL via merge-schema reads, and the next full-replace
    # optimize homogenizes the files again.
    evolved = synth_taxi(spark, 500).withColumn(
        "tip_amount", (F.col("trip_distance") * 1.5)
    ).withColumn("pickup_date", F.to_date("tpep_pickup_datetime"))
    table.commit(
        evolved,
        mode="append",
        partition_by=["pickup_date"],
        allow_schema_evolution=True,
    )
    snap = table.read(spark)
    print("after evolution:", snap.where(F.col("tip_amount").isNull()).count(),
          "legacy rows NULL-tip /", snap.count(), "total")

    # ------------------------------------------------------------------
    # 9. Stream OUT of the commit log (sources/txstream.py): a bronze
    # append-only table is tailed as a Structured Streaming source —
    # offsets are versions, each appended file is one executor-side
    # input partition, replays are exactly-once because manifests are
    # immutable. (Non-append commits fail the stream loudly; mutating
    # tables feed consumers via .changes() instead.)
    from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    bronze_root = os.path.join(root, "bronze")
    bronze = TransactionalTable(bronze_root)
    bronze.commit(synth_taxi(spark, 400).select(
        "tpep_pickup_datetime", "trip_distance", "total_amount"
    ), num_files=2)
    bronze.commit(synth_taxi(spark, 300).select(
        "tpep_pickup_datetime", "trip_distance", "total_amount"
    ), mode="append", num_files=2)
    stream = spark.readStream.format("txstream").option("path", bronze_root).load()
    q = (stream.writeStream.format("memory").queryName("bronze_tail").start())
    q.processAllAvailable()
    q.stop()
    print("streamed out of the commit log:",
          spark.table("bronze_tail").count(), "rows across 2 commits")

    # ------------------------------------------------------------------
    # 9b. Commit-time expectations (Delta Live Tables EXPECT shape): a
    # suspect batch lands gated by named fail-closed predicates —
    # violators are quarantined with the rules they broke, per-rule
    # counts ride the manifest as the audit trail, and only clean rows
    # become the snapshot.
    gated_root = os.path.join(root, "gated")
    gated = TransactionalTable(gated_root)
    suspect = synth_taxi(spark, 200).select(
        "trip_distance", "total_amount", "payment_type"
    )
    gated.commit_with_expectations(
        suspect,
        {
            "paid_something": "total_amount > 0",
            "known_payment": "payment_type >= 0",
        },
        on_violation="quarantine",
    )
    audit = gated.manifest()["meta"]["expectations"]
    print(
        "expectations:", audit["rows_seen"], "seen,",
        audit["rows_failed"], "quarantined", audit["violations"],
    )

    # ------------------------------------------------------------------
    # 9c. Incremental materialized view over the commit log: a
    # |keys|-row aggregate state refreshed from read_appended's
    # manifest file-set diff — the base is never re-scanned.
    from nyc_taxi_etl_pyspark_spark.operators.mv import refresh_agg_view

    view = TransactionalTable(os.path.join(root, "bronze_by_day"))

    def partial_fn(df):
        return df.groupBy(
            F.to_date("tpep_pickup_datetime").alias("day")
        ).agg(F.count("*").alias("__c"), F.sum("total_amount").alias("__s"))

    def merge_fn(states):
        return states.groupBy("day").agg(
            F.sum("__c").alias("__c"), F.sum("__s").alias("__s")
        )

    print("mv bootstrap:", refresh_agg_view(spark, bronze, view, partial_fn, merge_fn)["mode"])
    bronze.commit(synth_taxi(spark, 150).select(
        "tpep_pickup_datetime", "trip_distance", "total_amount"
    ), mode="append", num_files=1)
    print("mv refresh:", refresh_agg_view(spark, bronze, view, partial_fn, merge_fn)["mode"],
          "-", view.read(spark).count(), "state rows")

    # ------------------------------------------------------------------
    # 9d. Incident rollback: RESTORE TABLE TO VERSION — one metadata
    # commit re-listing the good snapshot's immutable files, zero bytes
    # copied; the bad version stays auditable until vacuum.
    bad_demo = TransactionalTable(os.path.join(root, "rollback_demo"))
    bad_demo.commit(synth_taxi(spark, 100).select("trip_distance", "total_amount"))
    bad_demo.commit(
        synth_taxi(spark, 5).select("trip_distance", "total_amount")
    )  # the "corrupted" overwrite
    v = bad_demo.restore(0)
    print(
        "restore:", f"v{v} re-lists v0;",
        bad_demo.count(), "rows (metadata count, no scan)",
    )

    # ------------------------------------------------------------------
    # 9e. The SQL front door (sources/txsql.py): the same table
    # lifecycle as statement TEXT — CTAS, INSERT, UPDATE, DELETE,
    # MERGE, OPTIMIZE, VACUUM, DESCRIBE HISTORY. Statement SHAPE is
    # parsed here; every expression is handed verbatim to Catalyst,
    # and UPDATE/DELETE prune files via band/bloom hints extracted
    # from the WHERE.
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml

    sql_root = os.path.join(root, "sql_demo")
    execute_dml(spark, f"""
        CREATE TABLE sql_demo LOCATION '{sql_root}' AS
        SELECT id AS ride_id, CAST(id % 5 AS DOUBLE) AS fare
        FROM range(100)
    """)
    execute_dml(spark, "INSERT INTO sql_demo SELECT 999, 42.0")
    print("sql update:", execute_dml(
        spark, "UPDATE sql_demo SET fare = fare * 1.1 WHERE fare >= 4"
    )["rows_updated"], "rows")
    print("sql delete:", execute_dml(
        spark, "DELETE FROM sql_demo WHERE ride_id BETWEEN 90 AND 94"
    )["rows_deleted"], "rows")
    print("sql optimize:", execute_dml(
        spark, "OPTIMIZE sql_demo INCREMENTAL"
    )["files_rewritten"], "files rewritten")
    hist = execute_dml(spark, "DESCRIBE HISTORY sql_demo")["history"]
    print("sql history ops:", [h["op"] for h in hist])

    # SELECT-level time travel, the CDF table-valued function, DDL,
    # and RESTORE — all as statement text through execute_sql (the
    # unified entry point: SELECT/WITH -> spark.sql after rewriting,
    # everything else -> execute_dml):
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_sql

    both = execute_sql(spark, """
        SELECT 'v0' AS snap, count(*) AS n FROM sql_demo VERSION AS OF 0
        UNION ALL
        SELECT 'head', count(*) FROM sql_demo
    """).collect()
    print("sql time travel:", {r.snap: r.n for r in both})
    feed = execute_sql(spark, """
        SELECT _change_type, count(*) AS n
        FROM table_changes('sql_demo', 0, 2, 'ride_id')
        GROUP BY _change_type ORDER BY _change_type
    """).collect()
    print("sql change feed:", [(r._change_type, r.n) for r in feed])
    execute_sql(
        spark, "ALTER TABLE sql_demo ADD COLUMNS (surcharge double)"
    )  # schema-only commit: zero files rewritten
    execute_sql(
        spark,
        "UPDATE sql_demo SET surcharge = fare * 0.1 WHERE ride_id < 10",
    )
    print("sql alter+update:", execute_sql(
        spark, "SELECT count(*) AS n FROM sql_demo WHERE surcharge IS NOT NULL"
    ).first().n, "rows carry the ALTERed column")
    print("sql restore:", execute_sql(
        spark, "RESTORE TABLE sql_demo TO VERSION AS OF 2"
    )["restored_to"])
    execute_dml(spark, "VACUUM sql_demo RETAIN 2 VERSIONS")

    # ------------------------------------------------------------------
    # 9f. Merge-on-read (deletion vectors): flip one table property and
    # DELETE/UPDATE/MERGE stop rewriting files — each commit is a small
    # position sidecar + appended rows, O(change) bytes against a table
    # of any width. Read debt is bounded by maintenance: COMPACT
    # DELETES collapses stacked sidecars (stats-only), PURGE rewrites
    # deadness-heavy files through the DV-aware reader.
    mor_root = os.path.join(root, "mor_demo")
    execute_dml(spark, f"""
        CREATE TABLE mor_demo LOCATION '{mor_root}' AS
        SELECT id AS ride_id, CAST(id % 7 AS DOUBLE) AS fare
        FROM range(1000)
    """)
    execute_dml(
        spark, "ALTER TABLE mor_demo SET TBLPROPERTIES (merge_on_read = true)"
    )
    print("dv delete:", execute_dml(
        spark, "DELETE FROM mor_demo WHERE fare = 0"
    )["files_rewritten"], "files rewritten (positions sidecar'd)")
    execute_dml(spark, "UPDATE mor_demo SET fare = fare + 100 WHERE ride_id < 3")
    spark.createDataFrame(
        [(1, 7.5), (5000, 1.0)], "ride_id bigint, fare double"
    ).createOrReplaceTempView("mor_changes")
    execute_dml(spark, """
        MERGE INTO mor_demo USING mor_changes AS s ON mor_demo.ride_id = s.ride_id
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    """)  # DV merge: matched positions soft-deleted, batch appended
    mor_t = TransactionalTable(mor_root)
    print("after dv merge:", mor_t.count(), "rows (metadata count,"
          " logical-row exact over stacked vectors)")
    print("dv compact:", execute_dml(
        spark, "OPTIMIZE mor_demo COMPACT DELETES"
    )["refs_before"], "sidecar refs -> one per file, nothing rewritten")
    print("dv purge:", execute_dml(
        spark, "OPTIMIZE mor_demo PURGE DELETES"
    )["rows_purged"], "dead rows materialized away")

    # ------------------------------------------------------------------
    # 10. History + vacuum: audit trail from the commit log; reclaim
    # files referenced by no retained version (retention = reader grace).
    for h in table.history():
        print(f"  v{h['version']:>2} rows={h['rows']:>6} files={h['n_files']:>3} "
              f"op={h['meta'].get('op', 'commit')}")
    # grace 0: this example is single-process (no concurrent writer can
    # have in-flight staged files), so young unreferenced files are
    # reclaimable immediately; a shared production table keeps the
    # default writer-grace window instead.
    vstats = table.vacuum(retain_versions=2, unreferenced_grace_s=0)
    print("vacuum:", vstats)
    print("final state intact:", table.read(spark).count(), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
