"""Property-based equivalence proof for the merge-on-read clause
decomposition (round 9): for ARBITRARY small bases, sources, and clause
lists (conditions, SET/VALUES expressions, orders, duplicate target
keys — everything a fixture can't enumerate),

    merge_clauses(base, updates, keys, clauses)
        ==  (base \\ touched)  ∪  appends

where (touched, appends) = merge_clauses_decomposed(...). This identity
is exactly what makes the DV route result-identical to the copy-on-write
rewrite — the engine-level parity tests (tests/test_txtable_dv.py) pin
the storage plumbing, this pins the ALGEBRA.

Spark jobs per example are expensive, so examples are few and wide
(deadline disabled)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.operators.merge import (
    merge_clauses,
    merge_clauses_decomposed,
)

# target rows: duplicate keys ALLOWED (each copy decides independently)
base_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=8)),  # k
    st.integers(min_value=-9, max_value=9),  # v
    st.integers(min_value=0, max_value=3),  # w (an unset passthrough col)
)
base_rows = st.lists(base_row, min_size=0, max_size=10)

# source rows: UNIQUE keys (the SQL-standard cardinality precondition
# the engine pre-checks); wider key range so inserts happen
src_pair = st.tuples(
    st.integers(min_value=0, max_value=12),
    st.integers(min_value=-9, max_value=9),
)

_M_CONDS = [None, "t.v > 0", "s.v < 0", "t.v % 2 = 0", "t.v > s.v"]
_I_CONDS = [None, "s.v > 0", "s.v % 2 = 0"]
_SETS = [
    "*",
    {"v": "s.v"},
    {"v": "t.v + s.v"},
    {"v": "s.v + 1", "w": "t.w + 10"},
    {"k": "t.k + 100", "v": "s.v"},  # key-mutating UPDATE
]
_VALUES = ["*", {"v": "s.v"}, {"v": "s.v - 1"}]

matched_clause = st.builds(
    lambda cond, is_del, st_: (
        {"when": "matched", "cond": cond, "action": "delete"}
        if is_del
        else {"when": "matched", "cond": cond, "action": "update", "set": st_}
    ),
    st.sampled_from(_M_CONDS),
    st.booleans(),
    st.sampled_from(_SETS),
)
insert_clause = st.builds(
    lambda cond, vals: {
        "when": "not_matched",
        "cond": cond,
        "action": "insert",
        "values": vals,
    },
    st.sampled_from(_I_CONDS),
    st.sampled_from(_VALUES),
)

clause_list = st.tuples(
    st.lists(matched_clause, min_size=0, max_size=3),
    st.lists(insert_clause, min_size=0, max_size=2),
).map(lambda t: list(t[0]) + list(t[1]))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tgt=base_rows,
    src_pairs=st.lists(src_pair, min_size=0, max_size=8),
    clauses=clause_list,
)
def test_decomposed_identity_vs_merge_clauses(spark, tgt, src_pairs, clauses):
    if not clauses:
        clauses = [{"when": "matched", "cond": None, "action": "delete"}]
    # unique source keys (keep first occurrence)
    seen: set[int] = set()
    src = [
        (k, v, 0)
        for k, v in src_pairs
        if not (k in seen or seen.add(k))
    ]
    base = spark.createDataFrame(
        [(k, v, w) for (k, v, w) in tgt] or [(None, None, None)],
        schema="k int, v int, w int",
    )
    if not tgt:
        base = base.limit(0)
    updates = spark.createDataFrame(
        src or [(None, None, None)], schema="k int, v int, w int"
    )
    if not src:
        updates = updates.limit(0)

    want = sorted(
        map(tuple, merge_clauses(base, updates, ["k"], clauses).collect()),
        key=str,
    )

    # decomposed route: tag each target row with a unique carry id
    tagged = spark.createDataFrame(
        [(k, v, w, i) for i, (k, v, w) in enumerate(tgt)]
        or [(None, None, None, None)],
        schema="k int, v int, w int, __rid int",
    )
    if not tgt:
        tagged = tagged.limit(0)
    touched, appends = merge_clauses_decomposed(
        tagged, updates, ["k"], clauses, ["__rid"]
    )
    dead = {r["__rid"] for r in touched.collect()}
    retained = [
        (k, v, w) for i, (k, v, w) in enumerate(tgt) if i not in dead
    ]
    got = sorted(
        retained + [tuple(r) for r in appends.collect()], key=str
    )
    assert got == want, (got, want, clauses)
