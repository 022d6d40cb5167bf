"""Differential tests: every oracle-declared query must match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01). Rows-only
queries are smoke-checked for execution + non-degenerate output."""

from __future__ import annotations

import pytest

from nyc_taxi_etl_pyspark_spark.plans.registry import all_oracle_sql, all_queries
from tests.oracle_harness import compare, run_oracle

ORACLES = all_oracle_sql()
QUERIES = all_queries()
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))

# rows-only queries expected to return at least one row at sf0.001
_MAY_BE_EMPTY = {"q_dedup_minhash", "q_dedup_simhash"}  # candidate pairs can be 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_df = run_oracle(sf_dir, ORACLES[name])
    problems = compare(spark_df, oracle_df, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert df.schema.fields, f"{name}: empty schema"
    if name not in _MAY_BE_EMPTY:
        assert n > 0, f"{name}: returned 0 rows"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
