"""Central query registry.

Every operator from SURVEY.md §2 is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an equivalent
ANSI-SQL oracle string that DuckDB runs on the same parquet tables. The
driver's correctness gate compares the two (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased identically in both formulations;
- multi-row float reductions (sum/avg/stddev/corr) are ``round()``-ed in
  BOTH engines so accumulation-order noise in the low mantissa bits cannot
  flip the hash;
- nothing order-dependent is emitted without a total deterministic order
  (limits/top-k always carry a unique tie-breaker key);
- timestamps are compared under UTC (session conf forced at load time).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver does the weaker rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as engine query ``name`` with optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all_modules() -> None:
    # Importing the query modules populates the registry.
    from nyc_taxi_etl_pyspark_spark.plans import (  # noqa: F401
        queries_aggs,
        queries_cdc,
        queries_core,
        queries_corpus,
        queries_events,
        queries_joins,
        queries_ml,
        queries_modern,
        queries_multimodal,
        queries_profiling,
        queries_setops,
        queries_sketch,
        queries_sql,
        queries_sql_tpch,
        queries_stream,
        queries_temporal,
        queries_text,
        queries_windows,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }


def get_query(name: str) -> QuerySpec:
    _load_all_modules()
    return _REGISTRY[name]
