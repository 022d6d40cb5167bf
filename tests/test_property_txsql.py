"""Property tests for the SQL front door's statement REWRITERS.

rewrite_time_travel / rewrite_table_changes are regex scanners over
raw statement text — the classic place where a quoting or boundary
edge silently corrupts a query. The properties pinned here:

1. **No registered name ⇒ identity.** Arbitrary SQL-ish text that
   mentions no registered transactional name (including text that
   LOOKS like travel clauses on unknown names) passes through
   byte-identical.
2. **String-literal immunity.** A travel clause or TVF call spelled
   INSIDE a single-quoted literal is data, never syntax — identity
   again, even when the literal names a REGISTERED table.
3. **Rewrite correctness.** For a registered name, every bare
   `name VERSION AS OF n` occurrence (outside literals) is replaced
   by a view that resolves to exactly snapshot n, and the rewritten
   text contains no travel clause for that name.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# identifier-ish words that are NOT registered targets
words = st.text(
    alphabet="abcdefgh_XYZ0123456789 ,.()=<>'\n", min_size=0, max_size=80
)
names = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True)


def _balanced_quotes(s: str) -> bool:
    return s.count("'") % 2 == 0


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(text=words)
def test_rewriters_are_identity_without_registered_names(spark, text):
    from nyc_taxi_etl_pyspark_spark.sources.txsql import (
        rewrite_table_changes,
        rewrite_time_travel,
    )

    assert rewrite_time_travel(spark, text) == text
    # table_changes on an UNREGISTERED name raises loudly (never a
    # silent guess); any other text is identity
    try:
        out = rewrite_table_changes(spark, text)
        assert out == text
    except ValueError as e:
        assert "unknown transactional table" in str(e)


@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(nm=names, version=st.integers(min_value=0, max_value=99))
def test_travel_clause_on_unknown_name_untouched(spark, nm, version):
    from nyc_taxi_etl_pyspark_spark.sources.txsql import (
        _DML_TARGETS,
        rewrite_time_travel,
    )

    # ensure the generated name is NOT registered
    if nm in _DML_TARGETS:
        return
    s = f"SELECT * FROM {nm} VERSION AS OF {version}"
    assert rewrite_time_travel(spark, s) == s


def test_string_literal_immunity_even_for_registered_names(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from nyc_taxi_etl_pyspark_spark.sources.txsql import (
        register_dml_target,
        rewrite_table_changes,
        rewrite_time_travel,
    )
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        TransactionalTable,
    )

    t = TransactionalTable(str(tmp_path / "lit"))
    t.commit(spark.range(3).select(F.col("id")))
    register_dml_target("txprop_lit", t)
    for s in (
        "SELECT 'txprop_lit VERSION AS OF 0' AS c FROM txprop_lit",
        "SELECT '  txprop_lit TIMESTAMP AS OF ''2020-01-01''' AS c",
        "SELECT 'table_changes(''txprop_lit'', 0)' AS c",
    ):
        # only the literal occurrences survive; the bare FROM in the
        # first statement has no travel clause so it stays bare too
        assert rewrite_time_travel(spark, s) == s
        assert rewrite_table_changes(spark, s) == s


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pad=st.text(alphabet="abc ,", min_size=0, max_size=20))
def test_travel_rewrite_resolves_the_pinned_snapshot(
    spark, tmp_path_factory, pad
):
    from pyspark.sql import functions as F

    from nyc_taxi_etl_pyspark_spark.sources.txsql import (
        execute_sql,
        register_dml_target,
    )
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        TransactionalTable,
    )

    root = tmp_path_factory.mktemp("prop") / "t"
    t = TransactionalTable(str(root))
    t.commit(spark.range(5).select(F.col("id")))
    t.commit(spark.range(11).select(F.col("id")), mode="append")
    register_dml_target("txprop_tt", t)
    n0 = execute_sql(
        spark,
        f"SELECT count(*) AS n FROM txprop_tt VERSION AS OF 0 --{pad}",
    ).first().n
    n1 = execute_sql(
        spark, "SELECT count(*) AS n FROM txprop_tt"
    ).first().n
    assert (n0, n1) == (5, 16)


def test_split_replace_where_values_named_column():
    """advice r11 (low) — a predicate referencing a column literally
    named ``values`` must not be mistaken for the query boundary: the
    query-start candidate must BEGIN a plausible query (VALUES
    followed by a row constructor '(', SELECT not followed by a
    comparison operator)."""
    from nyc_taxi_etl_pyspark_spark.sources.txsql import _split_replace_where

    pred, q = _split_replace_where("a = 1 AND values > 3 SELECT * FROM s")
    assert pred == "a = 1 AND values > 3"
    assert q == "SELECT * FROM s"
    # genuine VALUES rowset query still splits at the constructor
    pred, q = _split_replace_where("a = 1 VALUES (1, 2), (3, 4)")
    assert pred == "a = 1" and q == "VALUES (1, 2), (3, 4)"
    # a column named select used with a comparison stays predicate-side
    pred, q = _split_replace_where("a = 1 AND select >= 3 SELECT * FROM s")
    assert pred == "a = 1 AND select >= 3"
    assert q == "SELECT * FROM s"
    # no plausible query at all → None (caller raises the shape error)
    assert _split_replace_where("a = 1 AND values > 3") is None
