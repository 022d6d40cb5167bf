"""Cross-engine-stable rounding.

Spark and DuckDB disagree on rounding a double whose exact value sits on
a half boundary of the target scale (e.g. ``round(3367.635, 2)`` →
3367.63 vs 3367.64): Spark rounds the shortest decimal representation
HALF_UP, DuckDB rounds the scaled binary value. Money-like inputs (2
decimals) hit exact boundaries constantly through products and
power-of-two-denominator averages.

``stable_round`` nudges the value by +1e-9 before rounding — any value
farther than 1e-9 from a boundary (i.e. every value that is not an
exactly-terminating boundary rational) is unaffected, and boundary values
land consistently on the upper side in BOTH engines. Oracle SQL uses the
literal equivalent ``round(expr + 1e-9, n)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUND_EPS = 1e-9


def stable_round(col: Column, scale: int = 4) -> Column:
    return F.round(col + F.lit(ROUND_EPS), scale)


def oracle_round(expr: str, scale: int = 4) -> str:
    """The DuckDB-side spelling of ``stable_round`` for oracle strings."""
    return f"round(({expr}) + 1e-9, {scale})"


def stable_round0(col: Column, scale: int = 4) -> Column:
    """``stable_round`` + signed-zero normalization. Spark and DuckDB
    disagree on the SIGN of a zero result (``round(-1e-10, 4)`` → 0.0 in
    one engine, -0.0 in the other); -0.0 == 0.0 numerically but renders
    as a different string, which breaks string-sorted row comparison and
    value hashing. Adding +0.0 AFTER rounding maps -0.0 → +0.0 (IEEE) and
    is a no-op for everything else. Use for outputs that can legitimately
    round to zero (means of near-zero data, centered values); oracle-side
    spelling: ``round(expr + 1e-9, n) + 0.0``."""
    return F.round(col + F.lit(ROUND_EPS), scale) + F.lit(0.0)
