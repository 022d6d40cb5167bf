"""Vector math over ``array<float|double>`` columns — pure Catalyst
higher-order functions (SURVEY.md §2.12 similarity search).

Everything here stays JVM-side inside whole-stage codegen: ``zip_with``
multiplies element-wise, ``aggregate`` folds in index order (so the
floating-point accumulation order is deterministic and matches a
sequential oracle). No UDFs — at 100 TB a per-row Python hop on a 64-dim
column would dominate the query cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def pandas_cosine_similarity(query: list[float]):
    """Arrow-vectorized scalar ``pandas_udf`` cosine against a constant
    query vector — the alternative to the Catalyst higher-order-function
    path above for very wide embeddings, where one numpy matmul per Arrow
    batch beats per-element ``aggregate`` folding. The fold order differs
    from the sequential JVM version, so results can drift in the last
    float ulps — round before ranking (as all engine call sites do).

    Returns a Column-producing callable: ``pandas_cosine_similarity(q)(col)``.
    """
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query, dtype="float64")
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def cos(col: pd.Series) -> pd.Series:
        mat = np.stack(col.to_numpy())  # (batch, dim) float
        dots = mat.astype("float64") @ q
        norms = np.linalg.norm(mat, axis=1) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(norms != 0, dots / norms, np.nan)
        return pd.Series(out)

    return cos
