"""Vector math over ``array<float|double>`` columns — pure Catalyst
higher-order functions (SURVEY.md §2.12 similarity search).

Everything here stays JVM-side inside whole-stage codegen: ``zip_with``
multiplies element-wise, ``aggregate`` folds in index order (so the
floating-point accumulation order is deterministic and matches a
sequential oracle). No UDFs — at 100 TB a per-row Python hop on a 64-dim
column would dominate the query cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, folded left-to-right in element order."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖); NULL-safe for zero vectors."""
    denom = l2_norm_col(a) * l2_norm_col(b)
    return F.when(denom != 0, dot_col(a, b) / denom)
