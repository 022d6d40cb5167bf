"""Arrow (pandas_udf) backend for the sign-random-projection signature
stage of ``rp_lsh_similarity_join`` (round 14, guide §4.2).

Lives in its own module WITHOUT ``from __future__ import annotations``:
PySpark resolves pandas_udf type hints by evaluating them against the
function's module globals, so the iterator-form signature needs real
``pandas`` / ``Iterator`` names at module scope. Keeping the function in
an importable module (rather than a closure pickled by value) also lets
reused Python workers keep the derived plane family across tasks.
"""

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

# once-per-worker plane cache: (n_planes, dim, prefix) -> ndarray
_PLANES: dict = {}


def _planes(n_planes: int, dim: int, prefix: str) -> np.ndarray:
    key = (n_planes, dim, prefix)
    if key not in _PLANES:
        from nyc_taxi_etl_pyspark_spark.operators.similarity import (
            md5_rp_planes,
        )

        _PLANES[key] = np.array(
            md5_rp_planes(n_planes, dim, prefix=prefix), dtype=np.float64
        )
    return _PLANES[key]


def rp_sign_buckets_udf(
    n_bands: int, bits_per_band: int, dim: int, prefix: str = "rp"
):
    """pandas_udf mapping ``vec_col`` → the ``n_bands`` band buckets,
    bit j of band b = sign(v · plane[b·k+j]). The plane family is
    re-derived in the worker (``md5_rp_planes`` — the same 2048 tiny
    md5s the broadcast spelling evaluates engine-side, cached per
    worker process), and the dots are accumulated with a STRICT LEFT
    FOLD over the dimension axis (one vectorized multiply-add per
    component, in component order), so every dot is BIT-IDENTICAL to
    the interpreted ``aggregate(zip_with(...))`` HOF fold and to the
    DuckDB oracle's ``list_reduce`` — same IEEE ops in the same order
    (pinned by test_rp_sign_buckets_arrow_matches_expr). NULL or
    wrong-length vectors get NaN dots → all-zero buckets, matching the
    expr path's ``when(NULL > 0)`` → 0. The HOF spelling was the
    measured bottleneck of q_similarity_join_md5 (32 interpreted folds
    per row: 1.6 s of the signature stage at sf0.1; HOFs are
    CodegenFallback)."""
    n_planes = n_bands * bits_per_band

    @F.pandas_udf("array<long>")
    def sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        planes = _planes(n_planes, dim, prefix)
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)
        nan_row = np.full(dim, np.nan)
        for s in it:
            vecs = np.stack(
                [
                    np.asarray(v, dtype=np.float64)
                    if v is not None and len(v) == dim
                    else nan_row
                    for v in s
                ]
            )
            acc = np.zeros((len(s), n_planes), dtype=np.float64)
            for i in range(dim):  # strict left fold over components
                acc += vecs[:, i, None] * planes[None, :, i]
            bits = (acc > 0).reshape(len(s), n_bands, bits_per_band)
            buckets = bits.astype(np.int64) @ weights
            yield pd.Series(list(buckets))

    return sig
