"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference ingests only CSV/parquet through built-in readers
(`src/pipeline/main_etl.py:47-52`); a real lake also ingests from systems
Spark has no built-in connector for. Spark 4's Python DataSource API is
the idiomatic extension point: the source declares its schema and its
partition split, and executors call ``read(partition)`` in parallel — the
source participates in normal Spark planning (parallelism, task retry,
column pruning downstream) with zero JVM code.

``RangeDocSource`` is the engine's reference implementation: a
deterministic generator of (id, md5(id)) rows, split into N independent
InputPartitions. Deterministic output means the DuckDB oracle can
reproduce it exactly (``generate_series`` + ``md5``), so even the custom
connector path stays hash-verified. A real connector (REST API pages, a
message-queue snapshot, a proprietary file format) keeps this exact
shape: options → partition list → per-partition iterator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class RangeDocSource(DataSource):
    """``spark.read.format("rangedoc").option("n", …).option("partitions", …)``.

    Also a STREAMING source (``spark.readStream.format("rangedoc")``):
    the stream emits the same deterministic rows in ``batchsize`` chunks,
    with offsets tracked by the engine's checkpoint — so replay after a
    restart re-reads exactly the committed range (``readBetweenOffsets``
    re-derives any slice, which only works because the generator is a
    pure function of the offset — the property a replayable source
    needs)."""

    @classmethod
    def name(cls) -> str:
        return "rangedoc"

    def schema(self) -> str:
        return "id bigint, doc string"

    def reader(self, schema) -> "RangeDocReader":  # noqa: ANN001 - API signature
        return RangeDocReader(self.options)

    def simpleStreamReader(self, schema) -> "RangeDocStreamReader":  # noqa: ANN001
        return RangeDocStreamReader(self.options)


class RangeDocReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        """Exactly ``min(partitions, n)`` even [start, end) splits (sizes
        differ by at most 1) — a ceil-div step would silently produce
        FEWER partitions than requested for some (n, p)."""
        p = max(1, min(self.num_partitions, self.n))
        base, rem = divmod(self.n, p)
        bounds, lo = [], 0
        for i in range(p):
            hi = lo + base + (1 if i < rem else 0)
            bounds.append(InputPartition((lo, hi)))
            lo = hi
        return bounds

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for i in range(lo, hi):
            yield i, hashlib.md5(str(i).encode()).hexdigest()


def _rows(lo: int, hi: int) -> list[tuple]:
    # a LIST, not a generator: the engine pickles the prefetched batch
    # into its cache for replay, and generators don't pickle
    return [(i, hashlib.md5(str(i).encode()).hexdigest()) for i in range(lo, hi)]


class RangeDocStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offset = {"pos": next-unread id}. Bounded by
    ``n`` — once exhausted, ``read`` advances nothing and the stream
    idles (so ``processAllAvailable`` terminates in tests)."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.batchsize = int(options.get("batchsize", 250))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batchsize, self.n)
        # an ITERATOR over a materialized list: the runner drains it into
        # its prefetch cache (needs next()), and the cached rows must
        # pickle (so no lazy generator state)
        return iter(_rows(lo, hi)), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay of a committed-but-lost batch
        return iter(_rows(start["pos"], end["pos"]))


_REGISTERED_APPS: set[str] = set()


def register_python_sources(spark: SparkSession) -> None:
    """Idempotently register the engine's Python data sources."""
    from nyc_taxi_etl_pyspark_spark.sources.txcdf import TxTableCdfSource
    from nyc_taxi_etl_pyspark_spark.sources.txstream import TxTableStreamSource

    app_id = spark.sparkContext.applicationId
    if app_id in _REGISTERED_APPS:
        return
    spark.dataSource.register(RangeDocSource)
    spark.dataSource.register(TxTableStreamSource)
    spark.dataSource.register(TxTableCdfSource)
    _REGISTERED_APPS.add(app_id)
