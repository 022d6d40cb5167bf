"""Storage-path seam — the engine's analog of the reference's
``src/gcs/paths.py:1-4`` (four hardcoded ``gs://`` constants), made
generic: ONE root URI from config, every layer/table path derived from
it by scheme-agnostic joining. Local filesystem, ``file://``, ``s3a://``,
``gs://``, ``hdfs://`` — the engine never inspects the scheme except to
(a) guard rename-swap maintenance routines that require a local POSIX
filesystem (``io.require_local_path``) and (b) avoid mangling URIs with
``os.path`` functions. No bucket names, no provider assumptions: Spark's
Hadoop FileSystem connector resolves whatever the URI names.

Usage::

    layout = StorageLayout(root=os.environ.get("ENGINE_STORAGE_ROOT", sf_dir))
    spark.read.parquet(layout.table("lineitem"))

    lake = MedallionPaths(root="s3a://my-lake/nyc-taxi")   # config, not code
    lake.raw, lake.curated, lake.agg, lake.models
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit


def uri_scheme(path: str) -> str:
    """The URI scheme of ``path`` ('' for plain local paths). Windows
    drive letters are not a concern on the supported platforms."""
    return urlsplit(path).scheme


def is_local_uri(path: str) -> bool:
    return uri_scheme(path) in ("", "file")


def join_uri(base: str, *parts: str) -> str:
    """Scheme-agnostic path join: never ``os.path.join`` (it is
    platform-separator-dependent and collapses nothing for URIs) and
    never ``os.path.normpath`` (it rewrites ``s3a://b`` to ``s3a:/b``).
    Trailing slashes on ``base`` and leading slashes on ``parts`` are
    normalized away."""
    out = base.rstrip("/")
    for p in parts:
        p = p.strip("/")
        if p:
            out = f"{out}/{p}"
    return out


def normalize_uri(path: str) -> str:
    """Canonical cache-key form of a storage path: local paths get
    ``os.path.normpath`` (so ``a/b/`` and ``a//b`` dedupe), URIs only
    lose their trailing slash (normpath would corrupt the ``//``)."""
    import os

    if is_local_uri(path) and "://" not in path:
        return os.path.normpath(path)
    return path.rstrip("/")


@dataclass(frozen=True)
class StorageLayout:
    """One configured root URI; every table path derived, none hardcoded.

    ``fmt`` names the at-rest file format suffix used by the fixture
    layout (``<root>/<table>.parquet``); directory-per-table layouts
    (``<root>/<table>/``) come from ``dir_per_table=True`` — the shape
    partitioned/bucketed sinks write."""

    root: str
    fmt: str = "parquet"
    dir_per_table: bool = False

    def table(self, name: str) -> str:
        if self.dir_per_table:
            return join_uri(self.root, name)
        return join_uri(self.root, f"{name}.{self.fmt}")

    @property
    def scheme(self) -> str:
        return uri_scheme(self.root)

    @property
    def is_local(self) -> bool:
        return is_local_uri(self.root)


@dataclass(frozen=True)
class MedallionPaths:
    """The reference's four-constant layout (``src/gcs/paths.py:1-4``:
    raw CSV / curated parquet / hourly aggregates / saved models) from
    one root. The reference hardcodes a specific bucket per constant;
    here the root is config and the sublayout is convention."""

    root: str

    @property
    def raw(self) -> str:
        return join_uri(self.root, "raw")

    @property
    def curated(self) -> str:
        return join_uri(self.root, "curated")

    @property
    def agg(self) -> str:
        return join_uri(self.root, "agg")

    @property
    def models(self) -> str:
        return join_uri(self.root, "models")


def fixture_scratch_dir(prefix: str, sf_dir: str, anchor: str = "orders.parquet") -> str:
    """Deterministic per-fixture scratch directory for queries that
    materialize state (transactional-table demos): keyed by a
    ``hashlib`` digest — NOT the builtin ``hash()``, whose per-process
    salting (PYTHONHASHSEED) would mint a new directory every run and
    both defeat idempotent reuse and leak /tmp dirs — of the fixture
    path PLUS the anchor file's mtime and size, so a REGENERATED
    fixture gets a fresh scratch dir instead of replaying against a
    stale committed base. The pid is in the digest too: scratch tables
    are mutated with read-modify-write sequences that assume a single
    writer, so two parallel PROCESSES (pytest workers, concurrent
    bench runs) must not share one directory — per-process isolation
    with within-process reuse."""
    import hashlib
    import os
    import tempfile

    p = os.path.join(os.path.abspath(sf_dir), anchor)
    try:
        st = os.stat(p)
        tag = f"{p}|{st.st_mtime_ns}|{st.st_size}|{os.getpid()}"
    except OSError:
        tag = f"{p}|{os.getpid()}"
    digest = hashlib.md5(tag.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{digest}")
