"""Full reference-pipeline re-composition (SURVEY.md §3.1, §7 slice 6).

The reference's ETL (``src/pipeline/main_etl.py`` → ``src/features/
transformations.py`` → ``src/pipeline/etl_writer.py``) is one linear
pipeline: cast timestamps → derive duration → positive-value filters →
bounding-box filter → date parts → speed + sanity band → broadcast lookup
join → partitioned curated write → hourly aggregate write. This module
rebuilds that as *composable, configurable operators* over any
taxi-shaped DataFrame, and ``run_etl`` chains them with the two scale
fixes the reference lacks (SURVEY §3.1): the cleaned frame is cached once
(the reference re-scans the CSV for count + both writes), and
partition/file counts are parameters, not literals.

Every stage is pure ``DataFrame -> DataFrame`` — Catalyst sees one linear
plan (Project* → Filter* → BroadcastHashJoin) and pushes filters/pruning
into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.sources.io import write_parquet_partitioned

# Reference payment-type lookup (transformations.py:40-44), the engine's
# canonical literal in-memory dimension (SURVEY §2.1 S5).
PAYMENT_LOOKUP_ROWS = [
    (1, "Credit card"),
    (2, "Cash"),
    (3, "No charge"),
    (4, "Dispute"),
    (5, "Unknown"),
    (6, "Voided trip"),
]


# The reference's coarse NYC box (transformations.py:20-29, STRICT
# inequalities) — the default. The tighter city-proper box below is a
# documented alternative for callers who want to drop airport-fringe /
# GPS-drift coordinates the reference keeps.
NYC_REFERENCE_BBOX = (-75.0, -72.0, 40.0, 42.0)
NYC_TIGHT_BBOX = (-74.3, -73.7, 40.5, 41.0)


@dataclass(frozen=True)
class TaxiETLConfig:
    """Column names + bounds of the reference pipeline, parameterized.

    Defaults mirror ``src/features/transformations.py`` exactly: NYC
    bounding box ``(-75, -72, 40, 42)`` with STRICT bounds (lines
    20-29), 1-180 min duration (line 18), 0-120 km/h speed band
    (line 38). ``bbox=NYC_TIGHT_BBOX`` is the documented tighter
    alternative (keeps fewer rows than the reference default)."""

    pickup_ts: str = "tpep_pickup_datetime"
    dropoff_ts: str = "tpep_dropoff_datetime"
    distance: str = "trip_distance"
    positive_cols: tuple[str, ...] = (
        "trip_distance",
        "fare_amount",
        "total_amount",
        "passenger_count",
    )
    lon_cols: tuple[str, ...] = ("pickup_longitude", "dropoff_longitude")
    lat_cols: tuple[str, ...] = ("pickup_latitude", "dropoff_latitude")
    bbox: tuple[float, float, float, float] = NYC_REFERENCE_BBOX
    duration_bounds: tuple[float, float] = (1.0, 180.0)
    speed_bounds: tuple[float, float] = (0.0, 120.0)
    lookup_key: str = "payment_type"
    lookup_rows: tuple[tuple[int, str], ...] = tuple(PAYMENT_LOOKUP_ROWS)


def cast_timestamps(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """transformations.py:7-8 — string/ts → timestamp."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def derive_duration_min(
    df: DataFrame, start: str, end: str, out: str = "trip_duration_min"
) -> DataFrame:
    """transformations.py:11-15 — epoch-seconds delta / 60."""
    return df.withColumn(
        out, (F.col(end).cast("long") - F.col(start).cast("long")) / F.lit(60.0)
    )


def filter_positive(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """transformations.py:17 — conjunctive ``col > 0`` quality filter."""
    pred = None
    for c in cols:
        p = F.col(c) > 0
        pred = p if pred is None else pred & p
    return df.filter(pred)


def filter_bbox(
    df: DataFrame,
    lon_cols: tuple[str, ...],
    lat_cols: tuple[str, ...],
    bbox: tuple[float, float, float, float],
) -> DataFrame:
    """transformations.py:20-29 — geographic bounding-box filter.
    STRICT bounds (``>`` / ``<``), matching the reference exactly —
    a point sitting on the box edge is dropped there too."""
    lon_min, lon_max, lat_min, lat_max = bbox
    pred = None
    for c in lon_cols:
        p = (F.col(c) > lon_min) & (F.col(c) < lon_max)
        pred = p if pred is None else pred & p
    for c in lat_cols:
        pred = pred & (F.col(c) > lat_min) & (F.col(c) < lat_max)
    return df.filter(pred)


# English day-of-week abbreviations, indexed by Spark's dayofweek()
# (1=Sunday..7=Saturday). A literal mapping, NOT date_format(ts, 'E'):
# 'E' renders through the JVM default locale, so the same pipeline on a
# differently-configured cluster would emit different strings — the one
# reference behavior deliberately re-expressed (SURVEY §7 hard parts).
_DOW_ABBREV = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]


def derive_date_parts(df: DataFrame, ts: str, prefix: str = "pickup") -> DataFrame:
    """transformations.py:31-33 — to_date / hour / day-of-week. DOW is
    the reference's curated-schema string ("Sat"), produced
    locale-proof by indexing a literal array with ``dayofweek()``."""
    return (
        df.withColumn(f"{prefix}_date", F.to_date(ts))
        .withColumn(f"{prefix}_hour", F.hour(ts))
        .withColumn(
            f"{prefix}_dow",
            F.element_at(
                F.array(*[F.lit(d) for d in _DOW_ABBREV]), F.dayofweek(ts)
            ),
        )
    )


def derive_speed_kmh(
    df: DataFrame,
    distance: str,
    duration_min: str = "trip_duration_min",
    out: str = "avg_speed_kmh",
) -> DataFrame:
    """transformations.py:35-38 — distance / hours."""
    return df.withColumn(
        out, F.col(distance) / (F.col(duration_min) / F.lit(60.0))
    )


def lookup_dim(spark: SparkSession, rows, key: str, value: str) -> DataFrame:
    """transformations.py:40-44 — literal in-memory dimension (S5)."""
    return spark.createDataFrame(list(rows), schema=f"{key} int, {value} string")


def clean_and_transform(
    spark: SparkSession, df: DataFrame, cfg: TaxiETLConfig = TaxiETLConfig()
) -> DataFrame:
    """The reference's full cleaning pipeline (transformations.py:4-48),
    stage order preserved."""
    lo_d, hi_d = cfg.duration_bounds
    lo_s, hi_s = cfg.speed_bounds
    df = cast_timestamps(df, (cfg.pickup_ts, cfg.dropoff_ts))
    df = derive_duration_min(df, cfg.pickup_ts, cfg.dropoff_ts)
    df = filter_positive(df, cfg.positive_cols)
    df = df.filter(F.col("trip_duration_min").between(lo_d, hi_d))
    df = filter_bbox(df, cfg.lon_cols, cfg.lat_cols, cfg.bbox)
    df = derive_date_parts(df, cfg.pickup_ts, "pickup")
    df = derive_speed_kmh(df, cfg.distance)
    df = df.filter(F.col("avg_speed_kmh").between(lo_s, hi_s))
    dim = F.broadcast(
        lookup_dim(spark, cfg.lookup_rows, cfg.lookup_key, "payment_desc")
    )
    return df.join(dim, on=cfg.lookup_key, how="left")


def trips_by_hour(
    df: DataFrame,
    date_col: str = "pickup_date",
    hour_col: str = "pickup_hour",
    avg_cols: tuple[str, ...] = ("trip_distance", "total_amount", "trip_duration_min"),
) -> DataFrame:
    """etl_writer.py:24-35 — the flagship hourly aggregate, exact (no
    pre-sample; SURVEY §4.2), ordered for display parity."""
    aggs = [F.count("*").alias("total_trips")] + [
        F.avg(c).alias(f"avg_{c}") for c in avg_cols
    ]
    return df.groupBy(date_col, hour_col).agg(*aggs).orderBy(date_col, hour_col)


def run_etl(
    spark: SparkSession,
    raw: DataFrame,
    curated_path: str,
    agg_path: str,
    cfg: TaxiETLConfig = TaxiETLConfig(),
    agg_target_files: int | None = 4,
) -> dict:
    """End-to-end ETL (main_etl.py:63-101): clean → cache → count →
    curated partitioned write → hourly agg write. Returns row counts.

    Unlike the reference, the cleaned frame is cached before its three
    consumers (count + two writes) — the reference re-executed the CSV
    scan + clean 3× (SURVEY §3.1).

    Pipeline QA metrics ride on the ``Observation`` API: the per-batch
    accumulators (row count, null payment lookups, fare sum) are
    collected DURING the count pass — zero extra scans, unlike the
    reference's separate ``count()`` log lines — and returned under
    ``"metrics"``. On a cluster the same observation feeds a
    QueryExecutionListener / metrics sink."""
    from pyspark.sql import Observation

    obs = Observation("etl_qa")
    clean = clean_and_transform(spark, raw, cfg).cache()
    observed = clean.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("payment_desc").isNull().cast("long")).alias(
            "null_payment_desc"
        ),
        F.sum("total_amount").alias("sum_total_amount"),
    )
    try:
        n_clean = observed.count()
        write_parquet_partitioned(clean, curated_path, ["pickup_date"])
        agg = trips_by_hour(clean)
        write_parquet_partitioned(
            agg, agg_path, ["pickup_date"], target_files=agg_target_files
        )
        n_agg = agg.count()
    finally:
        clean.unpersist()
    return {"rows_clean": n_clean, "rows_agg": n_agg, "metrics": obs.get}


# --- incremental, partition-pruned ETL --------------------------------------

AGG_STATE_SUM_COLS = ("trip_distance", "total_amount", "trip_duration_min")


def hourly_agg_state(df: DataFrame) -> DataFrame:
    """Partial aggregate STATE for the hourly rollup: count + per-column
    sums — every column a commutative monoid, so states merge exactly
    (sum-of-counts / sum-of-sums). The published averages are derived at
    read time by :func:`hourly_agg_from_state`; carrying ``avg_*``
    directly would force an inexact weighted re-average on every merge
    (the q_incremental_agg rule: avg is carried as sum+count)."""
    return df.groupBy("pickup_date", "pickup_hour").agg(
        F.count("*").alias("total_trips"),
        *[F.sum(c).alias(f"sum_{c}") for c in AGG_STATE_SUM_COLS],
    )


def hourly_agg_from_state(state: DataFrame) -> DataFrame:
    """Derive the published ``trips_by_hour`` schema (avg_* columns,
    display ordering) from the monoid state."""
    return state.select(
        "pickup_date",
        "pickup_hour",
        "total_trips",
        *[
            (F.col(f"sum_{c}") / F.col("total_trips")).alias(f"avg_{c}")
            for c in AGG_STATE_SUM_COLS
        ],
    ).orderBy("pickup_date", "pickup_hour")


def _curated_dates(spark: SparkSession, curated_path: str) -> list[str]:
    """Date partitions already curated. Transactional layout: ONE
    manifest read (the per-file partition values ride the commit log —
    no listing at all). Plain local layout: one directory listing, zero
    data reads (on a cluster this is the metastore listing). Non-local
    or unreadable: fall back to a partition-values-only query, which
    Catalyst answers from directory names without touching row data."""
    import os

    from nyc_taxi_etl_pyspark_spark.sources.paths import is_local_uri
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        TransactionalTable,
        is_transactional,
    )

    if is_transactional(curated_path):
        m = TransactionalTable(curated_path).manifest()
        if not m:
            return []
        return sorted(
            {
                fs["partition"]["pickup_date"]
                for fs in m.get("stats", {}).values()
                if "partition" in fs and "pickup_date" in fs["partition"]
            }
        )
    if is_local_uri(curated_path):
        if not os.path.isdir(curated_path):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(curated_path)
            if d.startswith("pickup_date=")
        )
    try:
        rows = (
            spark.read.parquet(curated_path)
            .select("pickup_date")
            .distinct()
            .collect()
        )
    except Exception:
        return []
    return sorted(str(r["pickup_date"]) for r in rows)


def run_etl_incremental(
    spark: SparkSession,
    raw_batch: DataFrame,
    curated_path: str,
    agg_state_path: str,
    cfg: TaxiETLConfig = TaxiETLConfig(),
    agg_target_files: int | None = 4,
    table_format: str = "parquet",
) -> dict:
    """Partition-pruned incremental ETL: process ONLY the date
    partitions the new batch introduces.

    The reference reprocesses the full month on every run
    (``src/pipeline/main_etl.py`` reads the whole CSV, recleans, and
    rewrites everything); at 100 TB that is a full-table rewrite to add
    a day. This driver:

    1. cleans the incoming batch (same ``clean_and_transform`` plan),
    2. drops rows whose ``pickup_date`` is already curated — the
       date-aligned landing contract (a date's data arrives wholly in
       one batch, the reference's monthly layout); re-delivered or
       replayed batches therefore no-op instead of double-writing,
    3. dynamic-partition-overwrites ONLY the new date directories in
       the curated table (untouched partitions are never rewritten or
       even listed),
    4. maintains the hourly aggregate as a MONOID STATE table
       (count + sums, ``hourly_agg_state``): the new dates' partial
       states are written to their own partitions — no read-modify-
       write of existing state at all, because step 2 guarantees key
       disjointness. Publish with :func:`hourly_agg_from_state`.

    Per-run cost is O(batch + new partitions), independent of table
    size. Returns {dates_new, dates_skipped, rows_new}. Exactness
    contract (tested): after any sequence of date-aligned batches,
    curated == full recompute row-for-row, and the derived hourly
    aggregate equals ``run_etl``'s within float-sum reassociation.

    ``table_format``: ``"parquet"`` writes plain hive-partitioned
    directories via Spark's dynamic partition overwrite (correct on a
    filesystem with atomic rename); ``"tx"`` commits through the
    manifest commit-log table (``sources/txtable.py``,
    ``mode="replace_partitions"``) — the object-store-safe path, where
    the already-curated date set comes from ONE manifest read instead
    of a directory listing, each batch is one atomic commit (a reader
    can never see half a batch), and replayed batches no-op exactly as
    in the plain layout. Read tx results with
    ``TransactionalTable(path).read(spark)``."""
    if table_format not in ("parquet", "tx"):
        raise ValueError(f"table_format must be 'parquet' or 'tx', got {table_format!r}")
    existing = set(_curated_dates(spark, curated_path))
    clean = clean_and_transform(spark, raw_batch, cfg).cache()
    try:
        batch_dates = {
            str(r["pickup_date"])
            for r in clean.select("pickup_date").distinct().collect()
        }
        new_dates = sorted(batch_dates - existing)
        skipped = sorted(batch_dates & existing)
        if not new_dates:
            return {"dates_new": [], "dates_skipped": skipped, "rows_new": 0}
        fresh = clean.filter(
            F.col("pickup_date").isin([F.lit(d).cast("date") for d in new_dates])
        )
        n_new = fresh.count()
        # ORDER MATTERS for crash recovery: the aggregate STATE commits
        # FIRST, the curated partitions second. Replay detection keys on
        # the CURATED date set, so a crash between the two writes leaves
        # the batch's dates un-curated and the redelivered batch
        # reprocesses BOTH — the agg partitions are overwritten
        # idempotently (replace semantics per date partition). The
        # reverse order would mark the batch done at the curated layer
        # and permanently skip the lost aggregate write.
        if table_format == "tx":
            from nyc_taxi_etl_pyspark_spark.sources.txtable import (
                TransactionalTable,
            )

            TransactionalTable(agg_state_path).commit(
                hourly_agg_state(fresh),
                mode="replace_partitions",
                partition_by=["pickup_date"],
                meta={"op": "etl_incremental_agg", "dates": new_dates},
            )
            TransactionalTable(curated_path).commit(
                fresh,
                mode="replace_partitions",
                partition_by=["pickup_date"],
                meta={"op": "etl_incremental", "dates": new_dates},
            )
        else:
            write_parquet_partitioned(
                hourly_agg_state(fresh),
                agg_state_path,
                ["pickup_date"],
                target_files=agg_target_files,
                dynamic_overwrite=True,
            )
            write_parquet_partitioned(
                fresh, curated_path, ["pickup_date"], dynamic_overwrite=True
            )
    finally:
        clean.unpersist()
    return {"dates_new": new_dates, "dates_skipped": skipped, "rows_new": n_new}
