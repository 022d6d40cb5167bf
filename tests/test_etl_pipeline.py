"""Differential + property tests for the full reference-pipeline
re-composition (nyc_taxi_etl_pyspark_spark/etl.py).

The taxi-shaped input is synthesized deterministically from spark.range
(no RNG), cross-checked against DuckDB running the equivalent SQL over
the same rows — a composition-level oracle, not just per-operator.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.etl import (
    TaxiETLConfig,
    clean_and_transform,
    run_etl,
    trips_by_hour,
)

N_ROWS = 5000


def synth_taxi(spark):
    """Deterministic taxi-shaped frame: every column a pure function of
    the row id, spanning valid and out-of-band values for every filter."""
    return spark.range(N_ROWS).select(
        (F.col("id") % 7 - 1).cast("int").alias("payment_type"),  # -1..5
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


# bbox bounds are STRICT (> / <), mirroring the reference
# transformations.py:20-29; the template is instantiated for both the
# reference-default box and the documented tight box.
ORACLE_SQL_TEMPLATE = """
WITH dim(payment_type, payment_desc) AS (
  VALUES (1,'Credit card'),(2,'Cash'),(3,'No charge'),
         (4,'Dispute'),(5,'Unknown'),(6,'Voided trip')
), derived AS (
  SELECT *,
         (epoch(tpep_dropoff_datetime) - epoch(tpep_pickup_datetime)) / 60.0
           AS trip_duration_min
  FROM taxi
), clean AS (
  SELECT *, trip_distance / (trip_duration_min / 60.0) AS avg_speed_kmh
  FROM derived
  WHERE trip_distance > 0 AND fare_amount > 0 AND total_amount > 0
    AND passenger_count > 0
    AND trip_duration_min BETWEEN 1 AND 180
    AND pickup_longitude > {lon_min} AND pickup_longitude < {lon_max}
    AND dropoff_longitude > {lon_min} AND dropoff_longitude < {lon_max}
    AND pickup_latitude > {lat_min} AND pickup_latitude < {lat_max}
    AND dropoff_latitude > {lat_min} AND dropoff_latitude < {lat_max}
), speed AS (
  SELECT * FROM clean WHERE avg_speed_kmh BETWEEN 0 AND 120
)
SELECT strftime(tpep_pickup_datetime, '%Y-%m-%d') AS pickup_date,
       CAST(EXTRACT(hour FROM tpep_pickup_datetime) AS INT) AS pickup_hour,
       count(*) AS total_trips,
       round(avg(trip_distance) + 1e-9, 4) AS avg_trip_distance,
       round(avg(total_amount) + 1e-9, 4) AS avg_total_amount,
       round(avg(trip_duration_min) + 1e-9, 4) AS avg_trip_duration_min
FROM speed
GROUP BY 1, 2
ORDER BY 1, 2
"""


@pytest.mark.parametrize("bbox_name", ["reference_default", "tight"])
def test_pipeline_matches_duckdb(spark, bbox_name):
    """Composition-level differential vs DuckDB, run twice: once with
    the DEFAULT config (which must equal the reference's coarse
    strict-bounds box — advice r10: a silently tighter default kept
    fewer rows than the reference pipeline) and once with the
    documented tight box, which actually discriminates on this
    synthetic data."""
    from nyc_taxi_etl_pyspark_spark.etl import (
        NYC_REFERENCE_BBOX,
        NYC_TIGHT_BBOX,
    )

    raw = synth_taxi(spark)
    if bbox_name == "reference_default":
        cfg = TaxiETLConfig()
        assert cfg.bbox == NYC_REFERENCE_BBOX == (-75.0, -72.0, 40.0, 42.0)
    else:
        cfg = TaxiETLConfig(bbox=NYC_TIGHT_BBOX)
    clean = clean_and_transform(spark, raw, cfg)
    agg = trips_by_hour(clean)

    got = {
        (r["pickup_date"].isoformat(), r["pickup_hour"]): (
            r["total_trips"],
            round(r["avg_trip_distance"] + 1e-9, 4),
            round(r["avg_total_amount"] + 1e-9, 4),
            round(r["avg_trip_duration_min"] + 1e-9, 4),
        )
        for r in agg.collect()
    }

    lon_min, lon_max, lat_min, lat_max = cfg.bbox
    con = duckdb.connect()
    con.register("taxi", raw.toPandas())
    want = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            ORACLE_SQL_TEMPLATE.format(
                lon_min=lon_min, lon_max=lon_max,
                lat_min=lat_min, lat_max=lat_max,
            )
        ).fetchall()
    }
    assert got == want
    assert len(got) > 10  # the synthetic data produces a real spread
    if bbox_name == "tight":
        # the tight box must really be tighter than the reference
        # default on this data, or the second case proves nothing
        ref_n = clean_and_transform(spark, raw, TaxiETLConfig()).count()
        assert clean.count() < ref_n


def test_pipeline_invariants(spark):
    raw = synth_taxi(spark)
    clean = clean_and_transform(spark, raw)
    cfg = TaxiETLConfig()
    # every output row satisfies every filter (subset property)
    bad = clean.filter(
        ~(
            (F.col("trip_distance") > 0)
            & (F.col("trip_duration_min").between(*cfg.duration_bounds))
            & (F.col("avg_speed_kmh").between(*cfg.speed_bounds))
        )
    ).count()
    assert bad == 0
    # left lookup join preserves row count vs pre-join stage; desc only
    # non-null for known payment types
    known = dict(cfg.lookup_rows)
    for r in clean.select("payment_type", "payment_desc").distinct().collect():
        assert r["payment_desc"] == known.get(r["payment_type"])
    # cleaning is idempotent (already-clean data passes unchanged)
    again = clean_and_transform(spark, clean.drop(
        "trip_duration_min", "pickup_date", "pickup_hour", "pickup_dow",
        "avg_speed_kmh", "payment_desc",
    ))
    assert again.count() == clean.count()


def test_run_etl_roundtrip(spark, tmp_path):
    raw = synth_taxi(spark)
    curated = str(tmp_path / "curated")
    aggp = str(tmp_path / "agg")
    stats = run_etl(spark, raw, curated, aggp)
    back = spark.read.parquet(curated)
    assert back.count() == stats["rows_clean"] > 0
    # partition pruning works on the read-back layer
    one_date = back.select("pickup_date").first()["pickup_date"]
    pruned = spark.read.parquet(curated).filter(F.col("pickup_date") == one_date)
    assert 0 < pruned.count() <= stats["rows_clean"]
    agg_back = spark.read.parquet(aggp)
    assert agg_back.count() == stats["rows_agg"] > 0
    # Observation metrics rode the count pass (no extra scan): same row
    # count, and the fare sum matches a direct aggregate.
    m = stats["metrics"]
    assert m["rows"] == stats["rows_clean"]
    assert m["null_payment_desc"] >= 0
    direct = back.agg(F.sum("total_amount")).first()[0]
    assert abs(m["sum_total_amount"] - direct) < 1e-6 * max(1.0, abs(direct))


@pytest.mark.parametrize("table_format", ["parquet", "tx"])
def test_incremental_etl_matches_full_recompute(spark, tmp_path, table_format):
    """run_etl_incremental after two date-aligned batches must equal the
    full recompute: curated row-for-row, hourly aggregate within float
    reassociation — and a replayed batch must no-op (its dates are
    already curated), so redelivery cannot double-write. Both storage
    backends honor the same contract: plain hive-partitioned parquet
    (dynamic partition overwrite) and the manifest commit-log table
    (transactional replace_partitions — the object-store-safe path)."""
    from nyc_taxi_etl_pyspark_spark.etl import (
        hourly_agg_from_state,
        run_etl_incremental,
    )
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    def read_back(path):
        if table_format == "tx":
            return TransactionalTable(path).read(spark)
        return spark.read.parquet(path)

    raw = synth_taxi(spark)
    # date-aligned split: batch 1 = first 5 calendar days, batch 2 = rest
    cutoff = "2015-01-06"
    pick = F.to_date("tpep_pickup_datetime")
    batch1 = raw.filter(pick < F.lit(cutoff))
    batch2 = raw.filter(pick >= F.lit(cutoff))

    curated = str(tmp_path / "curated_inc")
    aggp = str(tmp_path / "agg_state")
    s1 = run_etl_incremental(spark, batch1, curated, aggp, table_format=table_format)
    s2 = run_etl_incremental(spark, batch2, curated, aggp, table_format=table_format)
    assert s1["rows_new"] > 0 and s2["rows_new"] > 0
    assert not (set(s1["dates_new"]) & set(s2["dates_new"]))

    # replay of batch 2 (redelivery): every date already curated -> no-op
    s3 = run_etl_incremental(spark, batch2, curated, aggp, table_format=table_format)
    assert s3 == {
        "dates_new": [],
        "dates_skipped": s2["dates_new"],
        "rows_new": 0,
    }

    # full recompute oracle
    curated_full = str(tmp_path / "curated_full")
    agg_full = str(tmp_path / "agg_full")
    stats = run_etl(spark, raw, curated_full, agg_full)

    inc_rows = read_back(curated)
    full_rows = spark.read.parquet(curated_full)
    assert inc_rows.count() == full_rows.count() == stats["rows_clean"]
    cols = sorted(set(full_rows.columns))
    got = sorted(map(tuple, inc_rows.select(*cols).collect()), key=repr)
    want = sorted(map(tuple, full_rows.select(*cols).collect()), key=repr)
    assert got == want

    agg_inc = hourly_agg_from_state(read_back(aggp)).collect()
    agg_want = spark.read.parquet(agg_full).orderBy(
        "pickup_date", "pickup_hour"
    ).collect()
    assert len(agg_inc) == len(agg_want) == stats["rows_agg"]
    for a, b in zip(agg_inc, agg_want):
        assert (a["pickup_date"], a["pickup_hour"], a["total_trips"]) == (
            b["pickup_date"], b["pickup_hour"], b["total_trips"]
        )
        for c in ("avg_trip_distance", "avg_total_amount",
                  "avg_trip_duration_min"):
            assert abs(a[c] - b[c]) <= 1e-9 * max(1.0, abs(b[c])), (a, b, c)


def test_incremental_etl_recovers_from_crash_between_commits(spark, tmp_path):
    """Review finding: the agg-state and curated writes are two commits;
    replay detection keys on the CURATED dates. The agg state therefore
    commits FIRST — a crash between them leaves the batch un-curated,
    and the redelivered batch reprocesses BOTH (agg partitions are
    overwritten idempotently). Simulated here by landing only the agg
    state for a batch (exactly the crash residue), then redelivering."""
    from nyc_taxi_etl_pyspark_spark.etl import (
        hourly_agg_from_state,
        hourly_agg_state,
        clean_and_transform,
        run_etl_incremental,
    )
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    raw = synth_taxi(spark)
    curated = str(tmp_path / "curated")
    aggp = str(tmp_path / "agg")

    # crash residue: the batch's AGG commit landed, curated did not
    clean = clean_and_transform(spark, raw)
    TransactionalTable(aggp).commit(
        hourly_agg_state(clean),
        mode="replace_partitions",
        partition_by=["pickup_date"],
    )
    # redelivery: dates are NOT curated, so the whole batch reprocesses
    stats = run_etl_incremental(spark, raw, curated, aggp, table_format="tx")
    assert stats["rows_new"] > 0 and stats["dates_skipped"] == []

    got = hourly_agg_from_state(
        TransactionalTable(aggp).read(spark)
    ).collect()
    want = hourly_agg_from_state(hourly_agg_state(clean)).collect()
    assert len(got) == len(want) > 0
    for a, b in zip(got, want):
        assert (a["pickup_date"], a["pickup_hour"], a["total_trips"]) == (
            b["pickup_date"], b["pickup_hour"], b["total_trips"]
        )
    assert TransactionalTable(curated).read(spark).count() == stats["rows_new"]


def test_pickup_dow_is_locale_proof_string(spark):
    """Curated-schema parity with the reference: pickup_dow is the
    English three-letter abbreviation (src/features/transformations.py:33
    uses date_format 'E', which is LOCALE-dependent; the engine indexes
    a literal array with dayofweek() so any cluster locale emits the
    identical strings). Golden: 2015-01-03 was a Saturday."""
    from nyc_taxi_etl_pyspark_spark.etl import derive_date_parts

    df = spark.createDataFrame(
        [("2015-01-03 10:00:00",), ("2015-01-04 10:00:00",),
         ("2015-01-05 10:00:00",), ("2015-01-09 23:59:59",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    got = {
        r["ts"].strftime("%Y-%m-%d"): r["pickup_dow"]
        for r in derive_date_parts(df, "ts").collect()
    }
    assert got == {
        "2015-01-03": "Sat",
        "2015-01-04": "Sun",
        "2015-01-05": "Mon",
        "2015-01-09": "Fri",
    }
    assert dict(derive_date_parts(df, "ts").dtypes)["pickup_dow"] == "string"
