"""Structured Streaming wrappers (SURVEY.md §2.9 — absent in the
reference, built as the streaming face of the same batch operators).

Design contract: the aggregation expressions are defined ONCE
(``hourly_agg_exprs``) and shared by the batch query
(``plans/queries_stream.py::q_window_tumbling``) and the streaming query
here — batch and stream cannot drift apart semantically.

Streaming shape: file source → ``withWatermark`` (bounds state for late
data; without it event-time aggregation state grows forever) → windowed
groupBy → sink. For tests/local smoke the sink is the in-memory table and
``processAllAvailable()`` drives the backlog synchronously; on a cluster
the same query writes parquet via ``foreachBatch`` for exactly-once
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.session import ensure_session_conf
from nyc_taxi_etl_pyspark_spark.sources.paths import join_uri
from nyc_taxi_etl_pyspark_spark.sources.tables import normalize_event_ts


def hourly_agg_exprs() -> list:
    """The shared tumbling-window aggregate list (count / sum / avg of
    ``value``) — used identically by batch and streaming plans."""
    return [
        F.count("*").alias("n_events"),
        stable_round(F.sum("value"), 4).alias("sum_value"),
        stable_round(F.avg("value"), 4).alias("avg_value"),
    ]


def streaming_tumbling_agg(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked event-time tumbling aggregation over a streaming DF."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(*hourly_agg_exprs())
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def run_streaming_tumbling_agg(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_hourly",
    window: str = "1 hour",
) -> DataFrame:
    """Drive the streaming aggregation over the fixture events parquet as
    a file-source backlog, synchronously to completion, and return the
    result as a (batch) DataFrame read from the in-memory sink.

    Complete output mode: every window closes once the backlog drains, so
    the result matches the batch tumbling aggregation — asserted in
    tests/test_streaming.py.
    """
    stream = _events_stream(spark, sf_dir)
    agg = streaming_tumbling_agg(stream, window=window)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the fixture events parquet (shared by the
    streaming queries; ts normalized from TIMESTAMP(NANOS) longs)."""
    ensure_session_conf(spark)
    batch_schema = spark.read.parquet(join_uri(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    stream = normalize_event_ts(stream)
    return stream


def run_streaming_sliding_agg(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_sliding",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding event-time window over the fixture backlog: each event
    lands in window/slide (=4) overlapping windows — the windowing state
    multiplier a 100 TB/day stream must budget for (state keys ×4 vs
    tumbling; watermark still bounds it). Driven synchronously to
    completion; row-for-row equality with the batch q_window_sliding on
    (window, count, sum) is asserted in tests/test_streaming.py."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(*hourly_agg_exprs())
        .select(
            F.col("win.start").alias("window_start"),
            "n_events",
            "sum_value",
            "avg_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_streaming_dedup(
    spark: SparkSession,
    sf_dir: str,
    key_cols: list[str] | None = None,
    watermark: str = "30 minutes",
    query_name: str = "stream_dedup",
) -> DataFrame:
    """Streaming exact deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps a key only until the watermark
    passes its event time, so state is O(keys per watermark window) —
    the only dedup that survives an unbounded 100 TB/day stream (plain
    ``dropDuplicates`` on a stream retains every key forever).

    Batch analog: ``q_dedup_exact`` (dropDuplicates on the same keys).
    On the fixture backlog every duplicate lands within one watermark, so
    the streamed distinct-key count equals the batch one — asserted in
    tests/test_streaming.py.
    """
    stream = _events_stream(spark, sf_dir)
    keys = key_cols or ["user_id", "event_type"]
    dedup = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    out = dedup.select(*keys)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_streaming_tumbling_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
    window: str = "1 hour",
) -> None:
    """Cluster-shaped sink: the same streaming aggregation written to
    a parquet directory via ``foreachBatch`` (exactly-once per
    micro-batch under the checkpoint). ``complete`` mode + overwrite
    per batch keeps closed windows idempotent; on a real stream you
    would switch to ``update`` + MERGE into a table format, and
    partition the sink (``write_parquet_partitioned``) once the
    aggregate outgrows one directory."""
    stream = _events_stream(spark, sf_dir)
    agg = streaming_tumbling_agg(stream, window=window)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_path)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def interval_join_exprs() -> str:
    """The shared stream-stream / batch interval-join condition: an error
    event joins each same-user click in the preceding 10 minutes. Defined
    ONCE so the streaming query and its batch-equality oracle
    (tests/test_streaming.py) cannot drift."""
    return (
        "user_id = err_user_id AND "
        "err_ts >= click_ts AND "
        "err_ts <= click_ts + interval 10 minutes"
    )


def run_streaming_interval_join(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_interval_join",
    watermark: str = "30 minutes",
) -> DataFrame:
    """STREAM-STREAM inner join with an event-time interval condition:
    clicks ⋈ errors per user, error within 10 minutes after the click.

    Both sides carry a watermark and the join condition bounds event time
    in BOTH directions, so Spark can compute exactly how long a buffered
    click can still match a future error (watermark + interval) and
    EVICT state past that — the condition is what makes an unbounded
    stream-stream join feasible; without the time bounds, both sides'
    state would grow forever. Append mode: a pair is emitted once, when
    the watermark proves no earlier match can arrive."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("err_user_id"),
            F.col("event_id").alias("err_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    joined = clicks.join(errors, F.expr(interval_join_exprs()), "inner").select(
        "user_id", "click_id", "err_id"
    )
    # No-data micro-batches are pure state-eviction passes for an
    # APPEND-mode INNER join — every pair is emitted in the data batch
    # that completes it (only OUTER joins hold results back for the
    # watermark), so on a drain-once backlog the trailing no-data batch
    # re-reads and rewrites all 4 state stores × partitions to evict
    # state the stop() below discards anyway (round 15, guide §7:
    # measured 3.5 s of the 9.9 s sf1 wall). A continuous production
    # stream keeps the default ON so state is evicted promptly; the
    # conf is restored either way.
    prev = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev
        )
    return spark.table(query_name)


def static_type_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small static dimension for stream enrichment: per-event-type
    stats materialized in batch (the broadcast-lookup side of the
    stream-static join; at scale this is the slowly-changing dim
    refreshed out-of-band while the stream runs)."""
    from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round

    ev = spark.read.parquet(join_uri(sf_dir, "events.parquet"))
    ev = normalize_event_ts(ev)
    # The mean is QUANTIZED to 4 decimals before it becomes a compare
    # threshold: a raw avg differs across engines at ~1e-15 relative
    # (summation order), and the above/below flag downstream must not
    # flip on that — same threshold-quantization discipline as the
    # percentile/MAD queries (SCALE.md round 3).
    return ev.groupBy("event_type").agg(
        stable_round(F.avg("value"), 4).alias("type_avg_value"),
        F.count("*").alias("type_n_events"),
    )


def run_streaming_static_join(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_static_join",
) -> DataFrame:
    """Stream-STATIC enrichment join: the event stream joined to a small
    batch-built dimension on event_type. Unlike stream-stream joins this
    keeps NO join state — each micro-batch probes the static side (which
    Spark broadcasts under the auto-broadcast threshold), so it scales to
    any stream volume; the dimension just has to fit an executor. The
    enriched rows flag events whose value exceeds their type's batch
    mean — the classic streaming anomaly-tag shape.

    Batch analog: the identical join+projection on the batch events
    table; row-for-row equality is asserted in tests/test_streaming.py.
    """
    stream = _events_stream(spark, sf_dir)
    dim = static_type_dim(spark, sf_dir)
    enriched = stream.join(F.broadcast(dim), "event_type").select(
        "event_id",
        "event_type",
        "value",
        (F.col("value") > F.col("type_avg_value")).alias("above_type_mean"),
    )
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def _checkpoint_identity(checkpoint_path: str) -> str:
    """Stable identity for a logical streaming query, stored INSIDE the
    checkpoint directory (``engine_identity``): resuming the same
    checkpoint — even after relocating the directory — yields the same
    identity, while a fresh checkpoint gets a fresh one. (The previous
    abspath-hash scheme made a merely-moved checkpoint look like a
    different query; ADVICE r3.) Created with O_EXCL so two racing
    starters of the same new checkpoint converge on one value.

    Upgrade-in-place: a checkpoint that already has STREAMING STATE
    (an ``offsets`` log) but no identity file predates the identity
    scheme — it mints the LEGACY sha256(abspath) id its bases were
    marked with, so existing pipelines keep resuming. A checkpoint
    with no prior state mints a RANDOM id, so a fresh query pointed at
    an old base still fails loudly instead of silently skipping or
    double-applying batches (blanket acceptance of the legacy hash
    would turn that refusal into data loss whenever a checkpoint path
    is recycled)."""
    import hashlib as _hashlib
    import os as _os
    import uuid as _uuid

    _os.makedirs(checkpoint_path, exist_ok=True)
    p = _os.path.join(checkpoint_path, "engine_identity")
    try:
        with open(p) as f:
            ident = f.read().strip()
        if ident:
            return ident
    except OSError:
        pass
    if _os.path.isdir(_os.path.join(checkpoint_path, "offsets")):
        ident = _hashlib.sha256(
            _os.path.abspath(checkpoint_path).encode()
        ).hexdigest()[:16]
    else:
        ident = _uuid.uuid4().hex[:16]
    try:
        fd = _os.open(p, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        with _os.fdopen(fd, "w") as f:
            f.write(ident)
        return ident
    except FileExistsError:
        # racer lost the O_EXCL: the winner created the file but may not
        # have written yet — spin briefly until content lands rather
        # than adopting an empty identity.
        import time as _time

        for _ in range(100):
            with open(p) as f:
                got = f.read().strip()
            if got:
                return got
            _time.sleep(0.01)
        raise RuntimeError(f"identity file {p} stayed empty")


def run_streaming_append_sink_tx(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    checkpoint_path: str,
    storage=None,
    expectations: dict[str, str] | None = None,
    on_violation: str = "drop",
    quarantine_path: str | None = None,
) -> None:
    """Exactly-once streaming APPEND into a transactional table — the
    bronze-ingest shape (stream → append-only raw table) made safe on
    object stores. Each micro-batch is ONE atomic append commit
    (``TransactionalTable.commit(mode="append")``): the new files and
    the manifest naming them land together, so a reader never sees a
    torn batch, and a crash mid-commit strands only unreferenced files
    (reclaimed by vacuum).

    Appends are NOT idempotent, so foreachBatch's at-least-once
    redelivery needs explicit replay protection: the checkpoint
    identity (``_checkpoint_identity``) and applied ``batch_id`` ride
    the manifest meta atomically with the data; a replayed batch whose
    id is already recorded for this checkpoint skips, and a FRESH
    checkpoint pointed at an existing base raises (its batch ids
    restart at 0 — silently skipping would drop data, re-appending
    would duplicate it). This is Spark's own file-sink exactly-once
    story (_spark_metadata log), generalized to a manifest any engine
    can read and any storage can host.

    ``expectations`` adds streaming data-quality gates (the Delta Live
    Tables EXPECT shape on a stream, sharing the batch gate's core,
    ``txtable.evaluate_expectations``): per micro-batch, named SQL
    predicates are evaluated fail-closed; per-rule CUMULATIVE violation
    counters ride the committed manifest's sticky ``app`` meta
    ATOMICALLY with the data (a maintenance commit cannot erase them,
    and a replayed batch cannot double-count because the counter update
    and the replay marker land in one manifest put). ``on_violation``:
    ``"drop"`` discards violators (counts still recorded), ``"fail"``
    fails the stream (the CI-gate mode), ``"quarantine"`` additionally
    appends violators — tagged ``__failed_expectations`` — to a sibling
    transactional table with its OWN replay marker: the two tables are
    not updated in one atomic step, but each is exactly-once under
    replay, so a crash between the two commits heals on the replayed
    batch (the applied side skips, the missing side applies)."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import is_local_uri
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        ExpectationViolation,
        TransactionalTable,
        evaluate_expectations,
        failed_expectation_names,
    )

    ensure_session_conf(spark)
    root = base_path.rstrip("/")
    if storage is None and not is_local_uri(root):
        raise ValueError(
            f"run_streaming_append_sink_tx: non-local base {root!r} needs "
            "an injected storage backend implementing conditional PUT "
            "(sources/txtable.py)."
        )
    if on_violation not in ("drop", "fail", "quarantine"):
        raise ValueError(
            f"on_violation={on_violation!r}: expected "
            "'drop', 'fail' or 'quarantine'"
        )
    ckpt_identity = _checkpoint_identity(checkpoint_path)
    table = TransactionalTable(root, storage=storage)
    qroot = (quarantine_path or root + "_quarantine").rstrip("/")
    qtable = (
        TransactionalTable(qroot, storage=type(table.storage)(qroot))
        if expectations and on_violation == "quarantine"
        else None
    )
    stream = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )

    def apply_marked_append(
        t: TransactionalTable, df: DataFrame, batch_id: int, extra_app=None
    ) -> None:
        """One exactly-once append under this checkpoint's replay
        marker — the CAS loop shared by the main and quarantine
        tables. ``extra_app(prev_app) -> app`` lets the main table fold
        cumulative expectation counters into the same atomic put."""
        from nyc_taxi_etl_pyspark_spark.sources.txtable import CommitConflict

        for _ in range(10):
            m = t.manifest()
            if m is not None:
                meta = m.get("meta", {})
                replay = meta.get("replay", meta)
                rec = replay.get("ckpt_identity")
                if rec is not None and rec != ckpt_identity:
                    raise ValueError(
                        f"{t.root} was built by a different streaming "
                        f"query (checkpoint identity {rec}, this query "
                        f"{ckpt_identity}): appending a fresh stream onto "
                        "an existing base would duplicate or drop batches. "
                        "Point the sink at a new base_path or resume the "
                        "original checkpoint."
                    )
                if int(replay.get("applied_batch_id", -1)) >= batch_id:
                    return  # replayed batch: already committed atomically
            meta_new = {
                "op": "stream_append",
                "replay": {
                    "ckpt_identity": ckpt_identity,
                    "applied_batch_id": batch_id,
                },
            }
            if extra_app is not None:
                prev_app = (
                    (m or {}).get("meta", {}).get("app") or {}
                )
                meta_new["app"] = extra_app(dict(prev_app))
            try:
                t.commit(
                    df,
                    mode="append",
                    meta=meta_new,
                    # -1 (not None) on an empty table: the FIRST append
                    # must also conflict-and-recheck, not blind-rebase.
                    expect_version=m["version"] if m is not None else -1,
                )
                return
            except CommitConflict:
                continue
        raise RuntimeError(
            f"append of batch {batch_id} lost 10 commit races on {t.root}"
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # The COMPLETE replay check (identity + applied batch id) lives
        # inside the CAS loop (apply_marked_append): replay-check and
        # append must be ATOMIC (expect_version pins the manifest the
        # check was made against), and every lost race must RE-RUN the
        # whole check — a loop that re-checked only the batch id would
        # let a FOREIGN-checkpoint writer's win register as "already
        # applied" and silently drop this stream's batch.
        if not expectations:
            apply_marked_append(table, batch_df, batch_id)
            return
        all_pass, flags, audit = evaluate_expectations(batch_df, expectations)
        if audit["rows_failed"] and on_violation == "fail":
            raise ExpectationViolation(
                f"{root}: batch {batch_id} has {audit['rows_failed']}/"
                f"{audit['rows_seen']} rows violating expectations "
                f"{audit['violations']}; stream stopped, nothing committed"
            )

        def fold_counters(prev_app: dict) -> dict:
            prev = prev_app.get("expectations") or {}
            prev_v = prev.get("violations") or {}
            prev_app["expectations"] = {
                "on_violation": on_violation,
                "predicates": dict(expectations),
                "rows_seen": prev.get("rows_seen", 0) + audit["rows_seen"],
                "rows_failed": prev.get("rows_failed", 0)
                + audit["rows_failed"],
                "violations": {
                    n: prev_v.get(n, 0) + audit["violations"][n]
                    for n in expectations
                },
            }
            return prev_app

        # main table first: primary data + counters land atomically;
        # a crash before the quarantine append heals on replay (main
        # skips via its marker, quarantine applies via its own).
        apply_marked_append(
            table, batch_df.filter(all_pass), batch_id, extra_app=fold_counters
        )
        if qtable is not None and audit["rows_failed"]:
            bad = batch_df.filter(~all_pass).withColumn(
                "__failed_expectations", failed_expectation_names(flags)
            )
            apply_marked_append(qtable, bad, batch_id)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


CDC_STATE_COLS = ["user_id", "event_type", "last_ts", "last_value", "n_events"]


def merged_cdc_state(
    batch_df: DataFrame, base: DataFrame | None
) -> DataFrame:
    """Fold one CDC micro-batch into the per-key state table:
    in-batch reduction (max_by on event time), count accumulation,
    and latest-wins BY EVENT TIME against the base — module-level so
    the out-of-order-batch protection is directly testable."""
    from nyc_taxi_etl_pyspark_spark.operators.merge import merge_upsert

    state_cols = CDC_STATE_COLS
    updates = (
        batch_df.groupBy("user_id", "event_type")
        .agg(
            F.max("ts").alias("last_ts"),
            F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
            F.count("*").alias("n_events"),
        )
    )
    if base is None:
        return updates.select(*state_cols)
    base = base.select(*state_cols)
    # Fold the base state into the update before the merge:
    # n_events ACCUMULATES across batches (never replaces), and
    # last_ts/last_value are latest-wins BY EVENT TIME against the
    # base — a later micro-batch carrying only OLDER events for a
    # key (out-of-order delivery) must not regress the recorded
    # latest state, which a blind row replacement would.
    prev = base.select(
        "user_id",
        "event_type",
        F.col("n_events").alias("__prev_n"),
        F.col("last_ts").alias("__prev_ts"),
        F.col("last_value").alias("__prev_v"),
    )
    stale = F.col("__prev_ts") > F.col("last_ts")  # NULL-safe: new
    # keys have NULL __prev_ts => condition false => update wins
    updates = (
        updates.join(prev, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.when(stale, F.col("__prev_ts"))
            .otherwise(F.col("last_ts"))
            .alias("last_ts"),
            F.when(stale, F.col("__prev_v"))
            .otherwise(F.col("last_value"))
            .alias("last_value"),
            (
                F.col("n_events")
                + F.coalesce(F.col("__prev_n"), F.lit(0))
            ).alias("n_events"),
        )
    )
    return merge_upsert(base, updates.select(*state_cols), ["user_id", "event_type"])


def run_streaming_upsert_sink(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    checkpoint_path: str,
    protocol: str = "auto",
    storage=None,
) -> None:
    """Streaming CDC apply: each micro-batch of events is reduced to one
    latest-state row per (user_id, event_type) key and MERGEd into a
    base table via ``operators/merge.py::merge_upsert`` inside
    ``foreachBatch`` — the standard "stream of changes → queryable
    current-state table" pattern. The in-batch reduction (max_by on
    event time) keeps the merge's update side one-row-per-key no matter
    how bursty the batch.

    foreachBatch is AT-LEAST-once (a crash between the sink commit and
    the checkpoint commit replays the batch), and this sink accumulates
    counts — so replay protection is explicit: the applied ``batch_id``
    plus the CHECKPOINT IDENTITY (a random id stored inside the
    checkpoint directory, ``_checkpoint_identity``) ride the committed
    base atomically, and a replayed batch whose id is already recorded
    FOR THIS CHECKPOINT is skipped. The identity guard matters: batch
    ids restart at 0 under a fresh checkpoint, so an id-only marker
    would silently skip every batch of a new query pointed at an old
    base — instead that mismatch raises, because re-streaming into a
    count-accumulating base double-counts. Scope, honestly: the raise
    requires a marker that CARRIES an identity (every marker this code
    writes). A legacy rename-protocol base whose marker is id-only has
    no identity to compare, so a fresh query pointed at it skips
    batches up to the recorded id rather than raising — resuming such
    a base needs its ORIGINAL checkpoint; retire legacy bases by
    re-materializing through the manifest protocol.

    ``protocol`` selects how a commit becomes visible:

    - ``"manifest"`` — the base is a :class:`~nyc_taxi_etl_pyspark_spark.
      sources.txtable.TransactionalTable`: the merged snapshot's files
      land under ``data/`` and ONE atomic manifest put publishes them,
      with the (identity, batch_id) marker in the manifest ``meta`` —
      safe on object stores, readers never see a partial table, and a
      crash mid-commit leaves the previous version fully readable.
      Read the result with ``TransactionalTable(base).read(spark)``.
    - ``"rename"`` — legacy two-rename directory swap for plain local
      parquet dirs (kept for existing layouts); crash recovery restores
      the newest ``.__old-*`` stranded dir by mtime. Local POSIX only.
    - ``"auto"`` (default) — ``"manifest"`` when the base already has a
      commit log, a ``storage`` backend is injected, or the path is a
      non-local URI; else ``"rename"``.

    On a real lake ``storage`` is the object-store adapter (conditional
    PUT); the join shape — small change set broadcast against the base
    — is identical in every mode.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from nyc_taxi_etl_pyspark_spark.operators.merge import merge_upsert
    from nyc_taxi_etl_pyspark_spark.sources.io import _restore_newest_stranded
    from nyc_taxi_etl_pyspark_spark.sources.paths import is_local_uri
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        TransactionalTable,
        is_transactional,
    )

    ensure_session_conf(spark)
    root = base_path.rstrip("/")
    if protocol == "auto":
        protocol = (
            "manifest"
            if storage is not None or is_transactional(root) or not is_local_uri(root)
            else "rename"
        )
    if protocol == "manifest" and storage is None and not is_local_uri(root):
        raise ValueError(
            f"run_streaming_upsert_sink: non-local base {root!r} needs an "
            "injected storage backend implementing conditional PUT "
            "(sources/txtable.py) — the default LocalStorage cannot "
            "address it."
        )
    if protocol == "rename":
        from nyc_taxi_etl_pyspark_spark.sources.io import require_local_path

        require_local_path(root, "run_streaming_upsert_sink(protocol='rename')")
    stream = _events_stream(spark, sf_dir)
    state_cols = CDC_STATE_COLS
    marker = "_applied_batch_id"
    ckpt_identity = _checkpoint_identity(checkpoint_path)
    table = TransactionalTable(root, storage=storage) if protocol == "manifest" else None

    def _check_replay(rec_identity: str | None, rec_id: int, batch_id: int) -> bool:
        """True → batch already applied (skip). Raises on foreign base.
        (A pre-upgrade checkpoint with prior streaming state mints the
        legacy abspath-hash identity — see _checkpoint_identity — so
        old bases resume without widening this equality check.)"""
        if rec_identity is not None and rec_identity != ckpt_identity:
            raise ValueError(
                f"{root} was built by a different streaming query "
                f"(checkpoint identity {rec_identity}, this query "
                f"{ckpt_identity}): re-applying a fresh stream onto "
                "an accumulating base would double-count. Point the "
                "sink at a new base_path or resume the original "
                "checkpoint."
            )
        return rec_id >= batch_id

    def _applied() -> tuple[str | None, int]:
        """(checkpoint identity, batch id) recorded in the base, or
        (None, -1) when the base carries no marker."""
        try:
            with open(_os.path.join(root, marker)) as f:
                lines = f.read().split()
        except OSError:
            return None, -1
        try:
            if len(lines) >= 2:
                return lines[0], int(lines[1])
            # legacy id-only marker: identity unknown
            return None, int(lines[0]) if lines else -1
        except ValueError:
            # corrupted/truncated marker: fail loudly — silently treating
            # it as "nothing applied" risks double-counting a replay.
            raise ValueError(
                f"corrupted replay marker in {root}/{marker}: {lines!r}; "
                "restore the base from a good copy or remove it to "
                "rebuild from the stream."
            ) from None

    _merged_state = merged_cdc_state

    def apply_batch_manifest(batch_df: DataFrame, batch_id: int) -> None:
        m = table.manifest()
        if m is not None:
            meta = m.get("meta", {})
            # replay watermark rides the reserved meta["replay"] slot,
            # carried forward by every other commit (optimize/merge/
            # delete) so maintenance cannot erase it; legacy manifests
            # recorded the keys at meta top level.
            replay = meta.get("replay", meta)
            if _check_replay(
                replay.get("ckpt_identity"),
                int(replay.get("applied_batch_id", -1)),
                batch_id,
            ):
                return
            base = table.read(spark)
            expect = m["version"]
        else:
            base, expect = None, None
        merged = _merged_state(batch_df, base)
        # single writer per checkpoint → the expect_version commit cannot
        # conflict in normal operation; if it ever does (misconfigured
        # second writer) the CommitConflict propagates and fails the
        # stream rather than double-counting.
        table.commit(
            merged,
            mode="replace",
            meta={
                "op": "stream_upsert",
                "replay": {
                    "ckpt_identity": ckpt_identity,
                    "applied_batch_id": batch_id,
                },
            },
            expect_version=expect,
        )

    def apply_batch_rename(batch_df: DataFrame, batch_id: int) -> None:
        # crash recovery: a failed swap may have stranded the base at
        # .__old-<id>; restore the newest (by mtime) if the base is missing.
        _restore_newest_stranded(root, root + ".__old-*")
        for leftover in _glob.glob(root + ".__old-*"):
            _shutil.rmtree(leftover, ignore_errors=True)
        base = None
        if _os.path.isdir(root):
            rec_identity, rec_id = _applied()
            if _check_replay(rec_identity, rec_id, batch_id):
                return
            base = spark.read.parquet(root)
        merged = _merged_state(batch_df, base)
        tmp = root + f".__batch{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        with open(_os.path.join(tmp, marker), "w") as f:
            f.write(f"{ckpt_identity} {batch_id}")
        if _os.path.isdir(root):
            old = root + f".__old-{batch_id}"
            _os.rename(root, old)
            _os.rename(tmp, root)
            _shutil.rmtree(old)
        else:
            _os.rename(tmp, root)

    apply_batch = (
        apply_batch_manifest if protocol == "manifest" else apply_batch_rename
    )

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_streaming_tx_source(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_tx_source",
    source_options: dict | None = None,
) -> DataFrame:
    """Stream OUT of a transactional table (``sources/txstream.py``):
    the events fixture is committed to a commit-log table in three
    deterministic append batches, a ``txstream`` Structured Streaming
    query tails the log (offsets = versions, one input partition per
    appended file, executor-side pyarrow reads), and the drained memory
    sink is returned — the consumer half of the medallion flow whose
    producer half is ``run_streaming_append_sink_tx``. Deterministic
    (fixed batch split, immutable manifests), so the DuckDB oracle is
    the plain events table."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    ensure_session_conf(spark)
    register_python_sources(spark)
    ev = normalize_event_ts(
        spark.read.parquet(join_uri(sf_dir, "events.parquet"))
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
        stable_round(F.col("value"), 4).alias("value"),
    )
    root = fixture_scratch_dir(
        "spark_graft_txsrc", sf_dir, anchor="events.parquet"
    )
    t = TransactionalTable(root)
    while t.latest_version() < 2:
        i = t.latest_version() + 1
        part = ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i)
        t.commit(
            part,
            mode="replace" if i == 0 else "append",
            num_files=2,
            meta={"op": f"ingest_batch_{i}"},
        )
    reader = spark.readStream.format("txstream").option("path", root)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.load()
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_streaming_corpus_dedup(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_corpus_dedup",
) -> DataFrame:
    """STREAMING corpus ingestion with dedup against history — the
    full training-data front door composed from the engine's own
    parts: documents land in a BRONZE commit-log table in three append
    commits; a ``txstream`` query tails the log; each micro-batch
    fingerprints its docs (``fingerprint_md5``), picks within-batch
    survivors, anti-joins the ADMITTED table (which doubles as the
    fingerprint index — it carries ``(doc_id, fprint)``), and appends
    only the novel fingerprints back. Two properties make this safe at
    scale:

    - **Self-idempotent under redelivery**: a replayed micro-batch
      anti-joins an index that already contains its own admissions, so
      it appends nothing — content-addressed ingestion needs no replay
      marker.
    - **Deterministic admission order**: the driver drains the stream
      after each bronze commit, so micro-batch boundaries == commit
      versions and the admitted set is exactly "first batch wins, then
      lowest doc_id" — declaratively replayable by the DuckDB oracle
      (rank per fingerprint by (batch, doc_id)).

    Per-batch cost is O(batch + |index|); the corpus text is never
    rescanned (the index holds 32-char keys, a fraction of a percent
    of corpus bytes at 100 TB)."""
    from pyspark.sql import Window

    from nyc_taxi_etl_pyspark_spark.functions.text import fingerprint_md5
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    ensure_session_conf(spark)
    register_python_sources(spark)
    base = fixture_scratch_dir(
        "spark_graft_streamdedup", sf_dir, anchor="documents.parquet"
    )
    bronze = TransactionalTable(base + "/bronze")
    index = TransactionalTable(base + "/admitted")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    w = Window.partitionBy("fprint").orderBy("doc_id")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        fp = batch_df.select(
            "doc_id", fingerprint_md5(F.col("text")).alias("fprint")
        )
        surv = (
            fp.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if index.exists():
            admitted = surv.join(
                index.read(spark).select("fprint"), "fprint", "left_anti"
            )
            index.commit(admitted, mode="append")
        else:
            index.commit(surv)

    def batch_docs(i: int) -> DataFrame:
        return docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)

    if not bronze.exists():
        bronze.commit(batch_docs(0), num_files=2)
    stream = (
        spark.readStream.format("txstream")
        .option("path", base + "/bronze")
        .load()
    )
    q = (
        stream.writeStream.queryName(query_name)
        .foreachBatch(apply_batch)
        .option("checkpointLocation", base + "/ckpt")
        .start()
    )
    try:
        for i in range(3):
            if bronze.latest_version() < i:
                bronze.commit(batch_docs(i), mode="append", num_files=2)
            # drain after every commit: micro-batch boundaries == commit
            # versions, which is what pins the admission order
            q.processAllAvailable()
    finally:
        q.stop()
    return index.read(spark).select("doc_id", "fprint")


def run_streaming_semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_semantic_dedup",
) -> DataFrame:
    """STREAMING SemDeDup — the embedding-space complement to
    :func:`run_streaming_corpus_dedup`'s exact-fingerprint front door:
    vectors land in a BRONZE commit-log table in three append commits,
    a ``txstream`` query tails the log, and each micro-batch

    1. assigns md5-anchor Voronoi CELLS (``semantic_cells`` — map-only,
       the same cross-engine quantizer q_dedup_semantic uses),
    2. resolves WITHIN-BATCH near-dups through the standard chain
       (within-cell cosine ≥ 0.3 pairs → star-contraction components →
       min-id survivors, i.e. ``semantic_dedup`` applied to the batch),
    3. drops batch survivors that have a cosine-≥0.3 neighbor among the
       ADMITTED vectors of the SAME cell (the history check joins on
       the cell key, so its pair space is batch×|admitted|/n_cells —
       in production this exact check upgrades to an ANN probe of the
       admitted index; cells keep it bounded either way), and
    4. appends the novel (vec_id, embedding, cell, label) rows back —
       the admitted table doubles as the cell-keyed vector index.

    Self-idempotent under redelivery (a replayed vector meets ITSELF
    in the index at cosine 1.0 and is dropped — no replay marker), and
    batch-deterministic (the driver drains per bronze commit, so
    admission is "first batch wins, then the within-batch component
    minimum"), which makes the whole run declaratively replayable by
    the q_streaming_semantic_dedup oracle: three unrolled batch stages,
    each a recursive-CTE component pass plus a NOT-EXISTS history
    check against the union of earlier admissions."""
    from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
    from nyc_taxi_etl_pyspark_spark.functions.vectors import (
        cosine_similarity_col,
    )
    from nyc_taxi_etl_pyspark_spark.operators.dedup import semantic_dedup
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.pyds import (
        register_python_sources,
    )
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        TransactionalTable,
    )

    ensure_session_conf(spark)
    register_python_sources(spark)
    base = fixture_scratch_dir(
        "spark_graft_semdedup", sf_dir, anchor="embeddings.parquet"
    )
    bronze = TransactionalTable(base + "/bronze")
    index = TransactionalTable(base + "/admitted")
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        surv = semantic_dedup(
            batch_df.select("vec_id", "embedding", "label"),
            id_col="vec_id",
            vec_col="embedding",
            dim=64,
            n_cells=8,
            threshold=0.3,
        ).select("vec_id", "embedding", "label", "cell")
        if index.exists():
            adm = index.read(spark).select(
                F.col("embedding").alias("__avec"), "cell"
            )
            clash = (
                surv.join(adm, "cell")
                .where(
                    stable_round(
                        cosine_similarity_col(
                            F.col("embedding"), F.col("__avec")
                        ),
                        4,
                    )
                    >= 0.3
                )
                .select("vec_id")
                .distinct()
            )
            novel = surv.join(clash, "vec_id", "left_anti")
            index.commit(novel, mode="append")
        else:
            index.commit(surv)

    def batch_vecs(i: int) -> DataFrame:
        return vecs.where(F.pmod(F.col("vec_id"), F.lit(3)) == i)

    if not bronze.exists():
        bronze.commit(batch_vecs(0), num_files=2)
    stream = (
        spark.readStream.format("txstream")
        .option("path", base + "/bronze")
        .load()
    )
    q = (
        stream.writeStream.queryName(query_name)
        .foreachBatch(apply_batch)
        .option("checkpointLocation", base + "/ckpt")
        .start()
    )
    try:
        for i in range(3):
            if bronze.latest_version() < i:
                bronze.commit(batch_vecs(i), mode="append", num_files=2)
            # drain after every commit: micro-batch boundaries == commit
            # versions, which is what pins the admission order
            q.processAllAvailable()
    finally:
        q.stop()
    return index.read(spark).select("vec_id", "label", "cell")


def run_streaming_silver_agg(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_silver_agg",
) -> DataFrame:
    """Streaming MATERIALIZED VIEW through the commit log — the
    medallion silver job end-to-end: events land in a bronze
    transactional table (three append commits), a ``txstream`` query
    tails it, and each micro-batch folds its PARTIAL aggregate
    (count + sum per event_type — commutative monoids, so any micro-
    batch slicing converges to the same state) into a silver
    transactional table via a replace commit. Unlike the dedup
    pipeline, aggregate increments are NOT idempotent, so the replay
    marker (checkpoint identity + applied batch id) rides the silver
    manifest meta atomically with the state: a redelivered batch whose
    id is already recorded skips, a foreign checkpoint pointed at the
    same silver table fails loudly, and a lost commit race re-reads
    the marker before retrying (the
    ``run_streaming_append_sink_tx`` protocol applied to state
    maintenance). Per refresh the silver table holds |keys| rows —
    the events corpus is scanned once as it streams, never again."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        CommitConflict,
        TransactionalTable,
    )

    ensure_session_conf(spark)
    register_python_sources(spark)
    base = fixture_scratch_dir(
        "spark_graft_silver", sf_dir, anchor="events.parquet"
    )
    bronze = TransactionalTable(base + "/bronze")
    silver = TransactionalTable(base + "/silver")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    # per-commit guard (not one exists() around all three): a run that
    # died mid-bootstrap resumes exactly where it stopped instead of
    # permanently streaming a partial bronze
    while bronze.latest_version() < 2:
        i = bronze.latest_version() + 1
        bronze.commit(
            ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i),
            mode="replace" if i == 0 else "append",
            num_files=2,
        )
    ckpt = base + "/ckpt"
    ident = _checkpoint_identity(ckpt)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("__c"), F.sum("value").alias("__s")
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        for _ in range(10):
            m = silver.manifest()
            if m is not None:
                replay = m.get("meta", {}).get("replay", {})
                rec = replay.get("ckpt_identity")
                if rec is not None and rec != ident:
                    raise ValueError(
                        f"{base}/silver was built by a different streaming "
                        f"query (identity {rec}, this query {ident}); "
                        "increments would double-count — use a fresh "
                        "silver path or resume the original checkpoint"
                    )
                if int(replay.get("applied_batch_id", -1)) >= batch_id:
                    return  # redelivered batch: state already holds it
            p = partial(batch_df)
            if m is not None:
                # monoid merge: sum-of-counts, sum-of-sums over the
                # |keys|-sized state + the batch partial — never the
                # corpus
                p = (
                    silver.read(spark)
                    .select("event_type", "__c", "__s")
                    .unionByName(p)
                    .groupBy("event_type")
                    .agg(F.sum("__c").alias("__c"), F.sum("__s").alias("__s"))
                )
            try:
                silver.commit(
                    p,
                    meta={
                        "op": "silver_agg",
                        "replay": {
                            "ckpt_identity": ident,
                            "applied_batch_id": batch_id,
                        },
                    },
                    expect_version=m["version"] if m is not None else -1,
                )
                return
            except CommitConflict:
                continue
        raise RuntimeError(
            f"silver refresh of batch {batch_id} lost 10 commit races"
        )

    stream = (
        spark.readStream.format("txstream")
        .option("path", base + "/bronze")
        .load()
    )
    q = (
        stream.writeStream.queryName(query_name)
        .foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return silver.read(spark).select(
        "event_type",
        F.col("__c").alias("n_events"),
        stable_round(F.col("__s"), 4).alias("sum_value"),
    )
