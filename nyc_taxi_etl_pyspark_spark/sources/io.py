"""Batch sources and sinks.

Covers the reference's IO surface (SURVEY.md §2.1):

- CSV scan with header (reference ``src/pipeline/main_etl.py:47-52``) — but
  with an *explicit schema* parameter: the reference's ``inferSchema=true``
  costs a second full pass over the data, which is unacceptable at 100 TB.
- Parquet scan (``src/pipeline/main_train.py:46``).
- Partitioned, overwrite-mode parquet sink with shuffle/partition alignment
  (``src/pipeline/etl_writer.py:4-12``) — partition columns and target file
  counts are arguments, not hardcoded ``coalesce(4)`` literals.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """CSV scan. Pass ``schema`` in production; ``infer_schema`` (the
    reference's default, ``main_etl.py:50``) forces a second full read and
    is only acceptable for exploration."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """JSON-lines scan. As with CSV, an explicit ``schema`` skips the
    sampling/inference pass — mandatory at scale, where inference reads
    (a sample of) every file before the real job starts."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (min/max stripe skipping, column projection reach the reader)."""
    return spark.read.orc(path)


def write_parquet_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-sorted parquet sink for data skipping: ``repartitionByRange``
    gives each output file a DISJOINT slice of the sort-key domain, and
    ``sortWithinPartitions`` orders rows inside each file, so parquet
    footer min/max stats let a later range-filtered scan skip whole files
    and row groups. At 100 TB this is the difference between "read the
    2% of files that can match" and "read everything" for any query
    filtering on the layout key (the poor man's Z-order; one extra
    range-exchange shuffle at write time buys it).
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key_col(bucket_cols: list, bits: int = 8):
    """Morton (Z-order) key: bit-interleave ``len(bucket_cols)`` already-
    bucketed integer columns (each in [0, 2**bits)) into one long. Pure
    Catalyst shift/mask arithmetic — stays in whole-stage codegen."""
    ncols = len(bucket_cols)
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for j, c in enumerate(bucket_cols):
            key = key + F.shiftleft(
                F.shiftrightunsigned(c.cast("long"), bit).bitwiseAND(F.lit(1)),
                bit * ncols + j,
            )
    return key


def write_parquet_zorder(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    bucketing: str = "width",
) -> None:
    """Z-order-clustered parquet sink: multi-column data skipping.

    ``write_parquet_range_sorted`` gives disjoint per-file ranges on ONE
    key; filtering on the second sort column still reads every file. This
    sink interleaves the bits of ``zorder_cols`` into a Morton key and
    range-partitions + sorts on it, so every file covers a small
    hyper-rectangle of the combined domain — parquet footer min/max stats
    then skip most files for a selective filter on ANY of the clustered
    columns (the Delta/Iceberg OPTIMIZE ZORDER technique, on plain
    parquet). Cost at write time: one tiny min/max agg job + one range
    exchange — the same shuffle budget as the single-key sink.

    Columns are bucketed into 2**bits cells either equal-width from their
    global min/max (one agg job; default) or, with
    ``bucketing="quantile"``, by approxQuantile cut points (one sketch
    job; Greenwald-Khanna, mergeable partials) — equal-POPULATED cells,
    which is what keeps files balanced when a domain is skewed (a
    power-law user_id would otherwise collapse most rows into a few
    Z-cells and recreate the hot-file problem at 100 TB).
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        zorder_frame(df, list(zorder_cols), bits=bits, num_files=n, bucketing=bucketing)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_bucket_exprs(
    df: DataFrame, zorder_cols: list[str], bits: int = 8, bucketing: str = "width"
) -> list:
    """Per-column cell-index expressions in [0, 2**bits) feeding
    ``zorder_key_col``. ``bucketing="width"``: equal-width cells from the
    global min/max (one agg job). ``bucketing="quantile"``: approxQuantile
    cut points (one sketch job) — equal-populated cells for skewed
    domains. Runs one small action on ``df`` either way."""
    nb = 1 << bits
    buckets = []
    if bucketing == "quantile":
        probs = [i / nb for i in range(1, nb)]
        # one sketch job for ALL columns (approxQuantile takes a col list)
        all_cuts = df.approxQuantile(list(zorder_cols), probs, 0.001)
        for c, cuts in zip(zorder_cols, all_cuts):
            # strictly increasing cut points; duplicates (heavy hitters)
            # collapse into one boundary — fewer, fuller cells, still valid
            expr = F.lit(0)
            for cut in sorted(set(cuts)):
                expr = expr + (F.col(c).cast("double") > F.lit(float(cut))).cast("int")
            buckets.append(expr)
    else:
        mins = [F.min(c).alias(f"__mn_{c}") for c in zorder_cols]
        maxs = [F.max(c).alias(f"__mx_{c}") for c in zorder_cols]
        stats = df.agg(*mins, *maxs).first()
        for c in zorder_cols:
            if stats[f"__mn_{c}"] is None or stats[f"__mx_{c}"] is None:
                # empty frame or all-NULL column: no span to bucket by
                # — constant cell keeps the key well-defined (found by
                # the hypothesis protocol model: delete-everything then
                # OPTIMIZE on a zorder-clustered table)
                buckets.append(F.lit(0))
                continue
            mn = float(stats[f"__mn_{c}"])
            span = max(float(stats[f"__mx_{c}"]) - mn, 1e-12)
            buckets.append(
                F.least(
                    F.lit(nb - 1),
                    F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * nb),
                )
            )
    return buckets


def zorder_frame(
    df: DataFrame,
    zorder_cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    bucketing: str = "width",
) -> DataFrame:
    """Return ``df`` range-partitioned + sorted on the Morton key of
    ``zorder_cols`` (key dropped from the output) — the reusable
    clustering step shared by the plain-parquet Z-order sink and the
    transactional table's ``commit(zorder_by=...)``."""
    buckets = zorder_bucket_exprs(df, zorder_cols, bits=bits, bucketing=bucketing)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__zkey", zorder_key_col(buckets, bits))
        .repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    target_files: int | None = None,
    mode: str = "overwrite",
    dynamic_overwrite: bool = True,
) -> None:
    """Partitioned parquet sink.

    Mirrors the reference's ``repartition("pickup_date") →
    write.partitionBy("pickup_date")`` alignment (``etl_writer.py:6-12``):
    repartitioning on the partition columns lines shuffle output up with
    directory layout, giving one writer task per partition dir instead of
    every task writing into every dir (small-files explosion at scale).

    ``target_files`` generalizes the reference's ``coalesce(4)``
    (``etl_writer.py:40``) for small aggregate outputs.
    ``dynamic_overwrite`` keeps untouched partitions when rewriting a
    slice of a 100 TB table instead of truncating the whole root.
    """
    if partition_cols:
        df = df.repartition(*[df[c] for c in partition_cols])
    if target_files is not None:
        df = df.coalesce(target_files)
    writer = df.write.mode(mode)
    if partition_cols:
        if dynamic_overwrite and mode == "overwrite":
            # Per-write option, not a session conf set: mutating the shared
            # session's partitionOverwriteMode would silently change the
            # semantics of every later partitioned write.
            writer = writer.option("partitionOverwriteMode", "dynamic")
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def require_local_path(path: str, op: str) -> None:
    """Guard for swap-based maintenance routines (``compact_parquet``,
    the streaming upsert sink): their crash-safety story is built on
    same-filesystem ``os.rename`` being atomic, which holds for a local
    POSIX filesystem and for nothing else — on an object store (s3://,
    gs://, abfs://) rename is copy+delete and a reader can observe a
    missing or half-copied table. Refuse non-local URIs up front instead
    of corrupting silently; on a real lake these routines are replaced
    by a table format's transactional MERGE/OPTIMIZE."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import is_local_uri, uri_scheme

    scheme = uri_scheme(path)
    if not is_local_uri(path):
        raise ValueError(
            f"{op} requires a local filesystem path (os.rename-based "
            f"directory swap); got scheme '{scheme}://' in {path!r}. "
            "Use a transactional table format for object-store tables."
        )


def _restore_newest_stranded(root: str, pattern: str) -> None:
    """Crash recovery for the two-rename swap: if the table directory is
    missing, restore the most-recently-modified stranded directory
    matching ``pattern`` (mtime, not name — uuid/batch-id suffixes do
    not sort lexicographically by recency)."""
    import glob

    if os.path.isdir(root):
        return
    stranded = glob.glob(pattern)
    if stranded:
        newest = max(stranded, key=os.path.getmtime)
        os.rename(newest, root)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction — the table-maintenance pass every long-lived
    lake needs (streaming sinks, dynamic-partition writes, and per-task
    writers all fragment; thousands of KB-files turn a 100 TB scan into a
    metadata storm and starve the vectorized reader of row groups).

    Two tiers, dispatched on the table's layout:

    - **Transactional table** (carries a ``_commits/`` manifest log,
      ``sources/txtable.py``): OPTIMIZE through the commit protocol —
      rewrite snapshot N into fewer immutable files and atomically
      commit manifest N+1. Safe on ANY storage (object stores included):
      readers resolve N or N+1, never a partial listing, and there is
      no instant where the table is absent. This is the production
      tier.
    - **Plain parquet directory**: the original two-rename swap —
      write-new, never delete-then-write, so the data is never
      half-written (a reader that lists in the instant BETWEEN the
      renames must retry; plain filesystems have no atomic directory
      swap — removing that window is exactly what the manifest tier
      does). Crash-safe: a crash between the renames strands the data
      at a unique ``.compact_old-*`` name, which the next invocation
      restores; stale leftovers are reaped. Rename-atomicity confines
      this tier to local POSIX paths — an object-store path must use
      the transactional layout (``TransactionalTable.commit`` once,
      then every later compact routes through the protocol).

    Returns {files_before, files_after, rows}. At scale the routine
    runs per partition directory (bounded unit of work) — what table
    formats' OPTIMIZE does; pair with ``write_parquet_range_sorted`` /
    ``write_parquet_zorder`` to restore clustering while compacting.
    """
    import glob
    import math
    import shutil
    import uuid

    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        TransactionalTable,
        is_transactional,
    )

    if is_transactional(path):
        return TransactionalTable(path).optimize(
            spark, target_rows_per_file=target_rows_per_file
        )

    require_local_path(path, "compact_parquet (plain-directory tier)")
    root = path.rstrip("/")
    # recover a crashed previous swap (newest by mtime), then reap
    # finished leftovers — including .compact_new-* dirs from a crash
    # after the rewrite but before the first rename.
    _restore_newest_stranded(root, root + ".compact_old-*")
    for leftover in glob.glob(root + ".compact_old-*") + glob.glob(
        root + ".compact_new-*"
    ):
        shutil.rmtree(leftover, ignore_errors=True)

    df = spark.read.parquet(root)
    rows = df.count()
    files_before = len([f for f in os.listdir(root) if f.endswith(".parquet")])
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    # recognizable prefix (not an anonymous mkdtemp): a crash before the
    # swap leaves a reappable .compact_new-* dir, never an orphan.
    tmp = root + f".compact_new-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(root).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    old = root + f".compact_old-{uuid.uuid4().hex[:8]}"
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old)
    files_after = len([f for f in os.listdir(root) if f.endswith(".parquet")])
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }
