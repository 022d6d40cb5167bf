"""Differential tests: every oracle-declared query must match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01). Rows-only
queries are smoke-checked for execution + non-degenerate output."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import DataFrame

from nyc_taxi_etl_pyspark_spark.plans.registry import all_oracle_sql, all_queries
from tests.oracle_harness import compare, run_oracle

ORACLES = all_oracle_sql()
QUERIES = all_queries()
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))

# rows-only queries expected to return at least one row at sf0.001
_MAY_BE_EMPTY = {"q_dedup_minhash", "q_dedup_simhash"}  # candidate pairs can be 0

# Streaming queries RUN a micro-batch query during construction and copy
# the bounded (|keys|-sized) final state into a fresh DataFrame — a
# documented, bounded materialization, outside the guard below.
_GUARD_EXEMPT_PREFIX = "q_streaming_"

# Bounded driver fetches (1-row query-vector literal, fixed-point
# convergence checks via .first() == limit(1).collect()) are legitimate;
# anything whose row count depends on DATA CONTENT is not (the
# q_stratified_sample distinct().collect() class). "Bounded" is decided
# by the analyzed plan's static maxRows, not by running the job.
_MAX_BOUNDED_DRIVER_ROWS = 1000


@contextmanager
def forbid_unbounded_collect(name: str):
    """Fail the test if plan construction materializes an unbounded
    DataFrame to the driver. collect() on a plan with statically-known
    maxRows <= _MAX_BOUNDED_DRIVER_ROWS (limit/take/first) stays legal."""
    if name.startswith(_GUARD_EXEMPT_PREFIX):
        yield
        return
    orig_collect = DataFrame.collect
    orig_topandas = DataFrame.toPandas

    def _bounded(df: DataFrame) -> bool:
        try:
            mr = df._jdf.queryExecution().analyzed().maxRows()
            return mr.isDefined() and mr.get() <= _MAX_BOUNDED_DRIVER_ROWS
        except Exception:
            return False

    def guarded_collect(self, *a, **k):
        assert _bounded(self), (
            f"{name}: unbounded DataFrame.collect() during plan "
            "construction — the operator is not distributed; pass the "
            "data as config or join a broadcast table instead"
        )
        return orig_collect(self, *a, **k)

    def guarded_topandas(self, *a, **k):
        assert _bounded(self), (
            f"{name}: unbounded DataFrame.toPandas() during plan construction"
        )
        return orig_topandas(self, *a, **k)

    DataFrame.collect = guarded_collect
    DataFrame.toPandas = guarded_topandas
    try:
        yield
    finally:
        DataFrame.collect = orig_collect
        DataFrame.toPandas = orig_topandas


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    with forbid_unbounded_collect(name):
        spark_df = QUERIES[name](spark, sf_dir)
    oracle_df = run_oracle(sf_dir, ORACLES[name])
    problems = compare(spark_df, oracle_df, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    with forbid_unbounded_collect(name):
        df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert df.schema.fields, f"{name}: empty schema"
    if name not in _MAY_BE_EMPTY:
        assert n > 0, f"{name}: returned 0 rows"


# Queries that compare data against an ENGINE-COMPUTED float threshold
# (percentile clip bounds, MAD cutoffs, mass thresholds): a 1-ulp
# cross-engine divergence in the threshold can flip an integer count, and
# whether a data value lands exactly on the threshold is DATA-DEPENDENT —
# sf0.001 passing says nothing about sf0.01 (the driver's scale). These
# run at sf0.01 in every local suite regardless of the session sf_dir.
_THRESHOLD_CLASS = [
    "q_winsorize",
    "q_mad_outliers",
    "q_text_heavy_hitters",
    "q_agg_equidepth_histogram",
]
_DRIVER_SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", _THRESHOLD_CLASS)
def test_threshold_class_parity_at_driver_sf(spark, name):
    import os

    if not os.path.isdir(_DRIVER_SF_DIR):
        pytest.skip(f"{_DRIVER_SF_DIR} not present")
    spark_df = QUERIES[name](spark, _DRIVER_SF_DIR)
    oracle_df = run_oracle(_DRIVER_SF_DIR, ORACLES[name])
    problems = compare(spark_df, oracle_df, name)
    assert not problems, "\n".join(problems)


# Float-aggregating queries whose summation order depends on the
# physical partitioning. The driver's session may run any parallelism,
# so rounded outputs must not sit close enough to a rounding boundary
# for partition-order jitter to flip them. (A fresh-session version of
# this audit — local[7], 5 vs 32 shuffle partitions, ALL oracle queries
# — ran clean in round 3; this in-session subset pins the property.)
_JITTER_QUERIES = [
    "q_agg_by_hour",
    "q_winsorize",
    "q_mad_outliers",
    "q_agg_corr",
    "q_agg_regression",
]


def test_float_outputs_partition_order_insensitive(spark, sf_dir):
    from tests.oracle_harness import normalize_frame

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[str, list] = {}
    try:
        for parts in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in _JITTER_QUERIES:
                frame = normalize_frame(QUERIES[name](spark, sf_dir).toPandas())
                results.setdefault(name, []).append(frame)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    for name, (a, b) in results.items():
        assert a == b, f"{name}: output depends on partition count"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
