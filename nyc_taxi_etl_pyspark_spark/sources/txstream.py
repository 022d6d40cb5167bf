"""Streaming source over a transactional commit-log table.

The Delta-Lake streaming-source shape for ``sources/txtable.py``
tables: a Structured Streaming query tails the commit log, each
micro-batch covering the versions committed since the last processed
offset, and each APPENDED data file becoming one executor-side input
partition. This is what turns the bronze-ingest tables the streaming
append sink writes (``streaming/jobs.py::run_streaming_append_sink_tx``)
into a live feed for downstream silver jobs — the missing half of the
medallion pipeline the reference batch-reprocesses monthly
(``src/pipeline/main_etl.py``).

Semantics (same contract as Delta's default source):

- **Offsets are versions.** An offset is ``{"version": N}`` = "every
  commit ≤ N has been emitted". ``latestOffset`` is the table's current
  latest version; the engine's checkpoint persists offsets, and
  ``partitions(start, end)`` re-derives the same file list for any
  replayed range (manifests are immutable), so recovery is exactly-once
  without source-side state. Manifests within the checkpoint's
  unprocessed range must not be vacuumed — retention is the replay
  window, exactly Delta's constraint.
- **Append-only.** A version that REMOVES files (replace / merge /
  delete / optimize) raises a loud error naming the version: silently
  re-emitting rewritten files would double-count, and skipping them
  would drop data. Consumers of mutating tables use
  ``TransactionalTable.changes`` (the change feed) instead.
- **Partition-parallel reads.** Each new file is one
  ``InputPartition``; executors read it with pyarrow directly (no
  driver materialization), reconstructing hive partition-column values
  from the manifest's per-file stats — the same metastore-free pruning
  metadata the batch reader uses.

``startingversion`` option (default 0) mirrors Delta's
``startingVersion``: 0 streams the table from its first commit
(initial snapshot included, as append-at-v0); N starts after N-1.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# partition-column value casters by manifest simpleString type prefix
_CASTERS = {
    "tinyint": int,
    "smallint": int,
    "int": int,
    "bigint": int,
    "float": float,
    "double": float,
    "string": str,
}


def _cast_partition_value(raw: str, type_str: str):
    for prefix, fn in _CASTERS.items():
        if type_str == prefix or type_str.startswith(prefix + "("):
            return fn(raw)
    raise ValueError(
        f"unsupported partition column type {type_str!r} for streaming "
        "source (supported: int/bigint/float/double/string)"
    )


class TxTableStreamSource(DataSource):
    """``spark.readStream.format("txstream").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "txstream"

    def _table(self):
        from nyc_taxi_etl_pyspark_spark.sources.txtable import (
            TransactionalTable,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("txstream requires .option('path', <table root>)")
        return TransactionalTable(path)

    def schema(self) -> str:
        m = self._table().manifest()
        if m is None or not m.get("schema"):
            raise ValueError(
                f"txstream: no committed schema at {self.options.get('path')}"
            )
        # manifest JSON is dumped with sort_keys => alphabetical field
        # order; the reader emits values in this same declared order
        return ", ".join(f"`{n}` {t}" for n, t in m["schema"].items())

    def streamReader(self, schema) -> "TxTableStreamReader":  # noqa: ANN001
        return TxTableStreamReader(self.options, schema)


class TxTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema=None) -> None:  # noqa: ANN001
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txstream requires .option('path', <table root>)")
        self.starting_version = int(options.get("startingversion", 0))
        # The stream's DECLARED schema (fixed at start) is the one
        # emission contract for EVERY batch: per-version manifest
        # schemas may differ on an evolved table — a pre-evolution
        # version must still emit the declared width (missing columns
        # NULL-fill), and a column added mid-stream must NOT widen the
        # tuples (restart the stream to surface it) — so the per-batch
        # plan always canonicalizes to this list, never to the
        # version's own schema.
        self.schema_fields = (
            [(f.name, f.dataType.simpleString()) for f in schema.fields]
            if schema is not None
            else None
        )

    def _table(self):
        from nyc_taxi_etl_pyspark_spark.sources.txtable import (
            TransactionalTable,
        )

        return TransactionalTable(self.path)

    def initialOffset(self) -> dict:
        # offset = last processed version; start streaming AT starting_version
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        return {"version": self._table().latest_version()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        """One InputPartition per file appended in (start, end] —
        derived purely from the immutable manifests, so a checkpoint
        replay of the same range plans the identical partitions."""
        t = self._table()
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            m = t.manifest(v)
            if m is None:
                raise ValueError(
                    f"txstream: manifest v{v} of {self.path} is missing "
                    "(vacuumed?) — cannot replay; restart from a newer "
                    "startingversion or raise vacuum retention"
                )
            prev = t.manifest(v - 1) if v > 0 else None
            prev_files = set(prev["files"]) if prev else set()
            removed = prev_files - set(m["files"])
            if removed:
                raise ValueError(
                    f"txstream: version {v} of {self.path} rewrites or "
                    f"removes {len(removed)} file(s) (op="
                    f"{m.get('meta', {}).get('op', 'replace')!r}) — the "
                    "streaming source is append-only; consume mutations "
                    "with TransactionalTable.changes() instead"
                )
            schema_items = self.schema_fields or list(m["schema"].items())
            stats = m.get("stats", {})
            for key in m["files"]:
                if key in prev_files:
                    continue
                part_vals = stats.get(key, {}).get("partition", {})
                parts.append(
                    InputPartition(
                        (t.storage.url(key), schema_items, part_vals)
                    )
                )
        return parts

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        """Executor-side: one staged parquet file → tuples in declared
        field order, hive partition columns rebuilt from the manifest's
        recorded values (the data pages don't carry them)."""
        import pyarrow.parquet as pq

        path, schema_items, part_vals = partition.value
        table = pq.read_table(path)
        cols = {}
        n = table.num_rows
        for name, type_str in schema_items:
            if name in part_vals:
                cols[name] = [_cast_partition_value(part_vals[name], type_str)] * n
            elif name in table.column_names:
                cols[name] = table.column(name).to_pylist()
            else:
                # schema-evolution append: this file predates (or
                # omitted) the column — NULL-fill, like the batch
                # reader's mergeSchema. (A stream only surfaces columns
                # in its START schema; restart to pick up new ones.)
                cols[name] = [None] * n
        names = [n_ for n_, _ in schema_items]
        for i in range(n):
            yield tuple(cols[name][i] for name in names)

    def commit(self, end: dict) -> None:
        # offsets live in the engine checkpoint; manifests are immutable
        # and replayable, so there is nothing source-side to finalize
        pass
