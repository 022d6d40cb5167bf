"""Fixture-table loading with per-session caching.

The correctness driver and the bench both call many independent queries
against the same scale-factor directory in one session. Re-reading (and
re-decoding) the same parquet for every query is pure waste, so loaded
tables are memoized per (application, sf_dir, table) and marked
``.cache()`` — at bench scale (sf0.1, ~600k lineitem rows) everything fits
in memory; on a real cluster the same call sites would instead rely on the
external shuffle / parquet page cache, so caching here is a local-mode
optimization that does not change plans' semantics.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.session import ensure_session_conf
from nyc_taxi_etl_pyspark_spark.sources.paths import StorageLayout, normalize_uri

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should always broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier"}

# Event-time columns whose physical parquet encoding has varied across
# fixture generations (TIMESTAMP(NANOS) read as long under nanosAsLong;
# TIMESTAMP(MICROS) isAdjustedToUTC=false read as timestamp_ntz). All engine
# operators assume a session-zoned TIMESTAMP, so normalize per read dtype.
_EVENT_TS_COLS = {"events": ("ts",)}

_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def normalize_event_ts(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize an event-time column to session-zoned TIMESTAMP.

    - ``bigint`` (parquet TIMESTAMP(NANOS) under nanosAsLong): exact integer
      division to microseconds — a double roundtrip would lose precision
      above 2^53 ns ≈ 1970+104 days.
    - ``timestamp_ntz`` (parquet MICROS, isAdjustedToUTC=false): cast to
      TIMESTAMP. The session timezone is forced to UTC (session.py), so the
      wall-clock value is preserved and Spark 4's refusal to cast NTZ to
      numeric types downstream no longer bites.
    """
    dtypes = dict(df.dtypes)
    for col in cols:
        dt = dtypes.get(col)
        if dt == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
        elif dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


_CACHE_LOCK = threading.Lock()
_KEY_LOCKS: dict[tuple[str, str, str], threading.Lock] = {}


def _key_lock(key: tuple[str, str, str]) -> threading.Lock:
    """Per-key lock so DISTINCT tables load concurrently (the bench warms
    all ten tables from a thread pool); a single global lock held across
    ``spark.read.parquet`` + normalize would serialize every loader and
    leave only the .count() actions parallel. The global lock guards only
    the two dict lookups — microseconds, not plan-building time."""
    with _CACHE_LOCK:
        return _KEY_LOCKS.setdefault(key, threading.Lock())


def load_table(
    spark: SparkSession, sf_dir: str, name: str, cached: bool = True
) -> DataFrame:
    """Load one fixture table from ``sf_dir``; memoized per session.
    ``sf_dir`` is any storage root URI (local path, file://, s3a://,
    gs://, hdfs://) — resolution goes through the ``StorageLayout`` seam
    (sources/paths.py), so swapping the lake location is config, never a
    code change (the reference hardcodes gs:// constants,
    ``src/gcs/paths.py:1-4``). Thread-safe: concurrent callers of the
    SAME table dedupe on a per-key lock (one reader builds, the rest
    reuse — duplicate ``.cache()`` registrations would leak executor
    memory); callers of different tables proceed in parallel."""
    ensure_session_conf(spark)
    layout = StorageLayout(root=sf_dir)
    key = (spark.sparkContext.applicationId, normalize_uri(sf_dir), name)
    if cached:
        with _key_lock(key):
            with _CACHE_LOCK:
                if key in _CACHE:
                    return _CACHE[key]
            df = spark.read.parquet(layout.table(name))
            df = normalize_event_ts(df, _EVENT_TS_COLS.get(name, ()))
            df = df.cache()
            with _CACHE_LOCK:
                if key in _CACHE:  # lost a rare race (e.g. a clear_cache
                    # pruned our key lock mid-load): keep the winner, drop
                    # ours so no orphaned cache registration leaks.
                    df.unpersist()
                    return _CACHE[key]
                _CACHE[key] = df
            return df
    df = spark.read.parquet(layout.table(name))
    return normalize_event_ts(df, _EVENT_TS_COLS.get(name, ()))


def clear_cache() -> None:
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - session already gone
            pass
    _CACHE.clear()
    # Prune the per-key locks too: they key on (applicationId, sf_dir,
    # table), so long-lived processes cycling sessions/scale factors
    # would otherwise leak a Lock per combination ever loaded (ADVICE
    # r3). Safe: any in-flight loader holding a pruned lock re-checks
    # _CACHE before inserting, and a racer simply mints a fresh lock.
    with _CACHE_LOCK:
        _KEY_LOCKS.clear()
