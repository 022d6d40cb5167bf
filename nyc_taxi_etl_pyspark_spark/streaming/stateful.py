"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension — the escape hatch for stateful semantics that
``window``/``session_window`` can't express).

Operator: gap-based sessionization with arbitrary per-session payload —
the streaming analog of ``plans/queries_stream.py::q_sessionize`` (30-min
inactivity gap). Per user_id, state carries the open session (start,
last-seen ts, event count, value sum); each micro-batch folds its rows
into that state, emits every session closed by a gap, and re-arms an
EVENT-TIME timeout at ``last_ts + gap`` so sessions also close when the
watermark passes them with no further traffic (late-data-safe, and state
is bounded — the two properties that make this run forever on a real
stream).

Scale shape: one shuffle on the grouping key per micro-batch; state lives
in the state store (RocksDB on a cluster), never on the driver; the
pandas fold is Arrow-batched per group.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from nyc_taxi_etl_pyspark_spark.session import ensure_session_conf
from nyc_taxi_etl_pyspark_spark.sources.paths import join_uri
from nyc_taxi_etl_pyspark_spark.sources.tables import normalize_event_ts

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_s", LongType()),
        StructField("session_end_s", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# state: (session_start_s, last_ts_s, n_events, sum_value)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("last_s", LongType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)


def make_sessionizer(gap_s: int = 1800):
    """Build the per-group fold function for applyInPandasWithState."""

    def sessionize(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        closed: list[tuple[int, int, int, int, float]] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: the open
            # session is final.
            start_s, last_s, n, sv = state.get
            closed.append((user_id, start_s, last_s, n, sv))
            state.remove()
        else:
            start_s = last_s = None
            n, sv = 0, 0.0
            if state.exists:
                start_s, last_s, n, sv = state.get

            rows = pd.concat(list(pdfs), ignore_index=True)
            # epoch seconds, whole-second session bounds (parity with the
            # batch q_sessionize cast-to-long semantics)
            ts_s = (rows["ts"].astype("int64") // 1_000_000_000).to_numpy()
            order = ts_s.argsort(kind="stable")
            # plain-float zip, NOT per-row pandas .iloc scalar access
            # (round 15, guide §4.2: .iloc inside the fold was ~10 µs/row
            # of pandas indexing machinery — the fold itself is the same
            # left-to-right scalar adds in the same order, so emitted
            # sums stay bit-identical); ~100× on the per-batch loop.
            ts_list = ts_s[order].tolist()
            val_list = (
                rows["value"].to_numpy(dtype="float64")[order].tolist()
            )
            for t, v in zip(ts_list, val_list):
                if start_s is None:
                    start_s, last_s, n, sv = t, t, 1, v
                elif t - last_s > gap_s:
                    closed.append((user_id, start_s, last_s, n, sv))
                    start_s, last_s, n, sv = t, t, 1, v
                else:
                    last_s, n, sv = t, n + 1, sv + v
            state.update((int(start_s), int(last_s), int(n), float(sv)))
            # close via event-time timeout once the watermark passes
            # last_ts + gap (ms since epoch)
            state.setTimeoutTimestamp((last_s + gap_s) * 1000)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_s",
                    "session_end_s",
                    "n_events",
                    "sum_value",
                ],
            )

    return sessionize


def streaming_sessionize(
    events_stream: DataFrame,
    gap_s: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-sessionize a streaming events frame with bounded state."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_s),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_streaming_sessionize(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_sessions",
    gap_s: int = 1800,
) -> DataFrame:
    """Drive the stateful sessionizer over the fixture events backlog and
    return emitted (closed) sessions as a batch DataFrame.

    Sessions still open when the backlog drains stay in state (they have
    not provably ended — correct streaming semantics); tests assert the
    emitted subset matches batch sessionization exactly.
    """
    ensure_session_conf(spark)
    batch_schema = spark.read.parquet(join_uri(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    stream = normalize_event_ts(stream)
    sessions = streaming_sessionize(stream, gap_s=gap_s)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
