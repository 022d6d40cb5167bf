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
  without source-side state. Every manifest in a range the stream may
  still (re)plan — from the checkpoint's last committed offset onward,
  plus its immediate predecessor (the file-diff base) — must not be
  vacuumed; a missing manifest is a LOUD error either way, never a
  silent full re-emit. Retention is the replay window, exactly Delta's
  constraint.
- **Append-only.** A version that REMOVES files (replace / merge /
  delete / optimize) raises a loud error naming the version: silently
  re-emitting rewritten files would double-count, and skipping them
  would drop data. Consumers of mutating tables use
  ``TransactionalTable.changes`` (the change feed) instead.
- **Partition-parallel reads.** Each new file is one
  ``InputPartition``; executors read it with pyarrow directly (no
  driver materialization) and emit Arrow record batches, reconstructing
  hive partition-column values from the manifest's per-file stats — the
  same metastore-free pruning metadata the batch reader uses (values
  are stored DECODED: percent-escapes resolved, the hive NULL sentinel
  mapped to None).

``startingversion`` option (default 0) mirrors Delta's
``startingVersion``: 0 streams the table from its first commit
(initial snapshot included, as append-at-v0); N starts after N-1. A
``startingversion`` beyond the current latest simply waits for that
version (the reported offset never regresses below it).
``startingtimestamp`` (mutually exclusive) mirrors Delta's
``startingTimestamp``: epoch seconds or an ISO datetime string,
resolved ONCE against the commit log at stream construction to the
first version committed strictly after the instant — the engine
checkpoint then pins that version, so restarts are stable.

``maxfilespertrigger`` mirrors Delta's ``maxFilesPerTrigger``
(admission control): each micro-batch admits whole versions until the
cumulative count of NEWLY-appended files reaches the cap, so a stream
started against a deep backlog (or a bursty producer) processes it in
bounded batches instead of one giant catch-up batch — the knob that
keeps per-batch shuffle/state memory flat at 100 TB. Versions are
atomic (a commit is all-or-nothing in the offset ledger), so a single
version larger than the cap is still admitted alone — progress is
guaranteed, the cap bounds batches made of MULTIPLE commits. Restart
safety needs no source-side state: the cap only shapes how fast
``latestOffset`` advances; the engine checkpoint still owns the
committed frontier, and replays re-derive identical file lists.

``maxbytespertrigger`` (Delta's ``maxBytesPerTrigger``) budgets the
same walk on the per-file ``bytes`` the commit's footer harvest
records in manifest stats — a soft cap, like Delta's: whole versions
admit until the byte budget is spent. A version containing a file
with no recorded size is treated as oversized (admitted, alone —
the conservative reading of an unknown). Both caps compose: the walk
stops at whichever budget runs out first.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# partition-column value casters by manifest simpleString type
_CASTERS: dict = {}


def _build_casters() -> dict:
    import datetime
    import decimal

    return {
        "tinyint": int,
        "smallint": int,
        "int": int,
        "bigint": int,
        "float": float,
        "double": float,
        "string": str,
        "boolean": lambda s: s.lower() == "true",
        "date": datetime.date.fromisoformat,
        "timestamp": datetime.datetime.fromisoformat,
        "timestamp_ntz": datetime.datetime.fromisoformat,
        "decimal": decimal.Decimal,
    }


def _cast_partition_value(raw, type_str: str):
    """Typed value for a manifest-recorded partition string (already
    hive-decoded by the writer; None = hive NULL sentinel)."""
    if raw is None:
        return None
    global _CASTERS
    if not _CASTERS:
        _CASTERS = _build_casters()
    for prefix, fn in _CASTERS.items():
        if type_str == prefix or type_str.startswith(prefix + "("):
            return fn(raw)
    raise ValueError(
        f"unsupported partition column type {type_str!r} for streaming "
        "source (supported: int family / float / double / string / "
        "boolean / date / timestamp / decimal)"
    )


def _arrow_type(type_str: str):
    """pyarrow type for a Spark simpleString scalar type, or None when
    unmappable (caller falls back to row-tuple emission)."""
    import pyarrow as pa

    table = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "binary": pa.binary(),
    }
    return table.get(type_str)


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
        self._handle = None  # before anything that calls _table()
        ts_opt = options.get("startingtimestamp")
        if ts_opt is not None and "startingversion" in options:
            raise ValueError(
                "txstream: pass either startingversion or "
                "startingtimestamp, not both"
            )
        if ts_opt is not None:
            # TIMESTAMP AS OF for the stream start (Delta's
            # startingTimestamp, INCLUSIVE): the stream begins at the
            # FIRST version committed at or after the instant (epoch
            # seconds or an ISO datetime string) — a commit landing
            # exactly at the given second is read, matching Delta.
            # Resolution happens at stream construction, so
            # the engine checkpoint pins the resulting version and
            # restarts are stable even as wall time moves on. An
            # instant PREDATING the table starts at version 0 (whole
            # table as the initial snapshot) — only an instant no
            # retained version precedes can't be resolved exactly when
            # older versions were vacuumed, and version_as_of raises
            # loudly there.
            try:
                epoch = float(ts_opt)
            except (TypeError, ValueError):
                import datetime

                dt = datetime.datetime.fromisoformat(str(ts_opt))
                if dt.tzinfo is None:
                    # naive ISO instants are UTC: commit wall-times are
                    # epoch seconds, and a storage-layer option must not
                    # change meaning with the submitting process's TZ
                    dt = dt.replace(tzinfo=datetime.timezone.utc)
                epoch = dt.timestamp()
            t = self._table()
            versions = sorted(t.versions())
            start = None
            for v in versions:
                m = t.manifest(v)
                ca = m.get("committed_at") if m is not None else None
                if ca is not None and ca >= epoch:
                    start = v
                    break
            if start is not None:
                self.starting_version = start
            elif versions:
                # every retained commit predates the instant: wait for
                # the next commit (the first one at/after the instant)
                self.starting_version = max(versions) + 1
            else:
                # empty table: wait at version 0 like startingversion=0
                self.starting_version = 0
        else:
            self.starting_version = int(options.get("startingversion", 0))
        if self.starting_version < 0:
            raise ValueError(
                f"txstream: startingversion must be >= 0, got "
                f"{self.starting_version}"
            )
        mft = options.get("maxfilespertrigger")
        self.max_files = None if mft is None else int(mft)
        if self.max_files is not None and self.max_files < 1:
            raise ValueError(
                f"txstream: maxfilespertrigger must be >= 1, got "
                f"{self.max_files}"
            )
        mbt = options.get("maxbytespertrigger")
        self.max_bytes = None if mbt is None else int(mbt)
        if self.max_bytes is not None and self.max_bytes < 1:
            raise ValueError(
                f"txstream: maxbytespertrigger must be >= 1, got "
                f"{self.max_bytes}"
            )
        # Admission high-water mark: the largest offset this reader has
        # handed to the engine (or seen back from it via partitions()/
        # commit() after a checkpoint restart). Driver-side only — the
        # engine checkpoint owns the real frontier; this just paces how
        # fast latestOffset advances when maxfilespertrigger is set.
        self._admitted = self.starting_version - 1
        # The stream's DECLARED schema (fixed at start) is the one
        # emission contract for EVERY batch: per-version manifest
        # schemas may differ on an evolved table — a pre-evolution
        # version must still emit the declared width (missing columns
        # NULL-fill), and a column added mid-stream must NOT widen the
        # rows (restart the stream to surface it) — so the per-batch
        # plan always canonicalizes to this list, never to a version's
        # own schema. A direct construction without a schema derives it
        # ONCE from the latest manifest for the same reason.
        if schema is not None:
            self.schema_fields = [
                (f.name, f.dataType.simpleString()) for f in schema.fields
            ]
        else:
            m = self._table().manifest()
            if m is None or not m.get("schema"):
                raise ValueError(
                    f"txstream: no committed schema at {self.path}"
                )
            self.schema_fields = list(m["schema"].items())
        # column mapping (RENAME COLUMN): pages store PHYSICAL names;
        # resolved once — physical names are immutable, so the map is
        # valid for every version this stream will ever admit
        mh = self._table().manifest() or {}
        self.phys_to_log = {
            p: l
            for l, p in (
                mh.get("meta", {}).get("column_mapping") or {}
            ).items()
        }

    def _table(self):
        from nyc_taxi_etl_pyspark_spark.sources.txtable import (
            TransactionalTable,
        )

        # one driver-side handle for the reader's lifetime: manifests
        # are immutable and cached per version inside the handle, so
        # repeated latestOffset/partitions calls across triggers don't
        # re-fetch the same manifest JSON from storage
        if self._handle is None:
            self._handle = TransactionalTable(self.path)
        return self._handle

    def initialOffset(self) -> dict:
        # offset = last processed version; start streaming AT starting_version
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        # never below starting_version - 1: a starting point beyond the
        # table's current head must WAIT for it, not let the offset
        # regress and later re-emit the skipped range
        t = self._table()
        head = max(t.latest_version(), self.starting_version - 1)
        capped = self.max_files is not None or self.max_bytes is not None
        if not capped or head <= self._admitted:
            self._admitted = max(self._admitted, head)
            return {"version": self._admitted}
        # admission control: walk forward from the high-water mark,
        # admitting whole versions while the NEW-file/byte budgets
        # last (both caps respected when both are set). One manifest
        # read per candidate version (cached, immutable).
        base = self._admitted
        prev = t.manifest(base) if base >= 0 else None
        if base >= 0 and prev is None:
            # the diff base was vacuumed: capping here would only mask
            # the loud unreplayable-range error partitions() raises —
            # surface it on the next batch instead of stalling forever
            self._admitted = head
            return {"version": head}
        prev_files = set(prev["files"]) if prev else set()
        file_budget = self.max_files
        byte_budget = self.max_bytes
        v = base
        while v < head:
            m = t.manifest(v + 1)
            if m is None:
                # missing in-range manifest: advance onto it so
                # partitions() raises its loud vacuumed-range error
                v += 1
                break
            new = set(m["files"]) - prev_files
            stats = m.get("stats", {})
            sizes = [stats.get(f, {}).get("bytes") for f in new]
            # a file with no recorded size can't be budgeted — treat
            # its version as oversized (admitted, but alone), the
            # conservative reading of an unknown
            new_bytes = (
                sum(sizes) if all(s is not None for s in sizes) else None
            )
            busts = (
                file_budget is not None and len(new) > file_budget
            ) or (
                byte_budget is not None
                and (new_bytes is None or new_bytes > byte_budget)
            )
            if v > base and busts:
                break  # next version would bust a cap; stop here
            v += 1
            if file_budget is not None:
                file_budget -= len(new)
            if byte_budget is not None:
                if new_bytes is None:
                    byte_budget = 0  # unknown size consumed the batch
                else:
                    byte_budget -= new_bytes
            prev_files = set(m["files"])
            if (file_budget is not None and file_budget <= 0) or (
                byte_budget is not None and byte_budget <= 0
            ):
                break
        if v == base:
            v = base + 1  # single oversized version: progress anyway
        self._admitted = v
        return {"version": v}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        """One InputPartition per file appended in (start, end] —
        derived purely from the immutable manifests, so a checkpoint
        replay of the same range plans the identical partitions. One
        manifest read per version in the range (the previous iteration's
        manifest is carried as the diff base — object-store LIST/GET
        round-trips are the planning cost here)."""
        t = self._table()
        parts: list[InputPartition] = []
        lo, hi = start["version"] + 1, end["version"] + 1
        # a checkpoint-restart replay tells us the engine's real
        # frontier — sync the admission mark so a capped stream resumes
        # FROM the checkpoint instead of re-pacing from starting_version
        self._admitted = max(self._admitted, end["version"])
        prev = None
        if lo > 0:
            prev = t.manifest(lo - 1)
            if prev is None and lo - 1 >= 0 and hi > lo:
                # the diff base is gone: treating it as empty would
                # re-emit version lo's ENTIRE cumulative file set as
                # "new" — the silent-duplication failure mode; fail the
                # way a missing in-range manifest fails
                raise ValueError(
                    f"txstream: manifest v{lo - 1} of {self.path} (the "
                    "file-diff base for this batch) is missing "
                    "(vacuumed?) — cannot replay; restart from a newer "
                    "startingversion or raise vacuum retention"
                )
        for v in range(lo, hi):
            m = t.manifest(v)
            if m is None:
                raise ValueError(
                    f"txstream: manifest v{v} of {self.path} is missing "
                    "(vacuumed?) — cannot replay; restart from a newer "
                    "startingversion or raise vacuum retention"
                )
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
            stats = m.get("stats", {})
            # a merge-on-read DELETE mutates rows WITHOUT removing any
            # file — its whole delta is retained files' stats gaining a
            # ``dv`` entry. The append-only contract must fail that just
            # as loudly as a rewrite (silently passing it through would
            # emit rows the table no longer contains).
            if prev is not None:
                prev_stats = prev.get("stats", {})
                # DV *compaction* (op == "compact_dv") rewrites each
                # file's sidecar ref LIST without changing which rows
                # are deleted — logical content is unchanged, so the
                # append-only contract treats it as a no-op. The claim
                # is VERIFIED, not trusted: matching dv.n alone would
                # let a buggy (or mislabeled) writer swap WHICH
                # positions are dead while keeping the count, so the
                # old and new sidecar position SETS for the file are
                # compared — a bounded driver read that only runs for
                # compaction commits (rare maintenance), O(dv.n) per
                # touched file. Anything that changes dv.n, positions,
                # or any dv change under a non-compaction op fails
                # loudly below.
                is_compact = m.get("meta", {}).get("op") == "compact_dv"

                # per-REF fingerprint memo: compaction writes ONE shared
                # sidecar referenced by every compacted file, so reading
                # it once per file would be O(files × total positions)
                # of driver Python — each sidecar is scanned ONCE,
                # accumulating every file's fingerprint in a single
                # pass (O(total positions) overall, O(1) memory per
                # batch plus one small dict per ref)
                _ref_fps: dict[str, dict] = {}

                def _ref_fingerprints(ref: str) -> dict:
                    cached = _ref_fps.get(ref)
                    if cached is not None:
                        return cached
                    import pyarrow.parquet as pq

                    out: dict[str, list] = {}
                    pf = pq.ParquetFile(t.storage.url(ref))
                    for batch in pf.iter_batches(columns=["file", "pos"]):
                        fcol = batch.column(0).to_pylist()
                        pcol = batch.column(1).to_pylist()
                        for f, p in zip(fcol, pcol):
                            fp = out.setdefault(f, [0, 0, 0])
                            fp[0] += 1
                            fp[1] += p
                            fp[2] ^= (
                                p * 0x9E3779B97F4A7C15
                            ) & 0xFFFFFFFFFFFFFFFF
                    _ref_fps[ref] = out
                    return out

                def _positions(dv: dict | None, key: str) -> tuple:
                    """Order-independent fingerprint (count, sum, xor of
                    a mixed 64-bit hash) of the file's recorded
                    positions across the dv's sidecars. Positions
                    within one file's DV are unique by construction,
                    so equal fingerprints ⇔ equal sets for any
                    non-adversarial writer."""
                    cnt, tot, xor = 0, 0, 0
                    for ref in (dv or {}).get("refs", []):
                        fp = _ref_fingerprints(ref).get(key)
                        if fp is not None:
                            cnt += fp[0]
                            tot += fp[1]
                            xor ^= fp[2]
                    return (cnt, tot, xor)

                def _dv_changed(key: str) -> bool:
                    new_dv = stats.get(key, {}).get("dv")
                    old_dv = prev_stats.get(key, {}).get("dv")
                    if new_dv == old_dv:
                        return False
                    if (
                        is_compact
                        and (new_dv or {}).get("n") == (old_dv or {}).get("n")
                        and _positions(old_dv, key)
                        == _positions(new_dv, key)
                    ):
                        return False
                    return True

                dv_mutated = [
                    key
                    for key in m["files"]
                    if key in prev_files and _dv_changed(key)
                ]
                if dv_mutated:
                    raise ValueError(
                        f"txstream: version {v} of {self.path} attaches a "
                        f"deletion vector to {len(dv_mutated)} retained "
                        f"file(s) (op="
                        f"{m.get('meta', {}).get('op', 'replace')!r}) — "
                        "the streaming source is append-only; consume "
                        "mutations with TransactionalTable.changes() "
                        "instead"
                    )
            for key in m["files"]:
                if key in prev_files:
                    continue
                part_vals = stats.get(key, {}).get("partition", {})
                parts.append(
                    InputPartition(
                        (
                            t.storage.url(key),
                            self.schema_fields,
                            part_vals,
                            self.phys_to_log,
                        )
                    )
                )
            prev = m
        return parts

    def read(self, partition: InputPartition) -> Iterator:
        """Executor-side: one staged parquet file → Arrow record
        batches in declared field order, hive partition columns rebuilt
        from the manifest's recorded values (the data pages don't carry
        them). Columns whose declared type has no direct Arrow mapping
        fall back to row-tuple emission — correctness over speed for
        the exotic types, zero per-value Python objects for the common
        ones."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        path, schema_items, part_vals, phys_to_log = partition.value
        table = pq.read_table(path)
        if phys_to_log:
            # column mapping: page columns renamed to logical before
            # the declared-order projection
            table = table.rename_columns(
                [phys_to_log.get(c, c) for c in table.column_names]
            )
        n = table.num_rows
        arrays, fallback = [], False
        for name, type_str in schema_items:
            if name in part_vals:
                at = _arrow_type(type_str)
                if at is None:
                    fallback = True
                    break
                arrays.append(
                    pa.array(
                        [_cast_partition_value(part_vals[name], type_str)] * n,
                        type=at,
                    )
                )
            elif name in table.column_names:
                col = table.column(name).combine_chunks()
                at = _arrow_type(type_str)
                if at is not None and col.type != at:
                    # schema widening (ALTER COLUMN TYPE): the file
                    # stores the narrow physical type; emit the
                    # declared width, like the batch reader's explicit
                    # wide schema
                    col = col.cast(at)
                arrays.append(col)
            else:
                # schema-evolution append: this file predates (or
                # omitted) the column — NULL-fill, like the batch
                # reader's mergeSchema
                at = _arrow_type(type_str)
                if at is None:
                    fallback = True
                    break
                arrays.append(pa.nulls(n, type=at))
        if not fallback:
            out = pa.table(
                arrays, names=[name for name, _ in schema_items]
            )
            yield from out.to_batches(max_chunksize=1 << 16)
            return
        # tuple fallback for unmappable declared types
        cols = {}
        for name, type_str in schema_items:
            if name in part_vals:
                cols[name] = [
                    _cast_partition_value(part_vals[name], type_str)
                ] * n
            elif name in table.column_names:
                cols[name] = table.column(name).to_pylist()
            else:
                cols[name] = [None] * n
        names = [name for name, _ in schema_items]
        for i in range(n):
            yield tuple(cols[name][i] for name in names)

    def commit(self, end: dict) -> None:
        # offsets live in the engine checkpoint; manifests are immutable
        # and replayable, so there is nothing source-side to finalize —
        # just keep the admission mark monotone with the engine's view
        self._admitted = max(self._admitted, end["version"])
