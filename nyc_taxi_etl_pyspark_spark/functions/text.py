"""Text-analysis column functions (SURVEY.md §2.12): tokenization,
shingles, n-grams, quality signals, fingerprints.

All built-in Catalyst expressions (split / transform / filter /
aggregate / md5) — zero Python in the row path. ``documents.text`` in the
fixtures is single-space-separated lowercase tokens, but these functions
normalize defensively (lower + multi-space split) so they hold on real
corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English-ish stopword list used by quality scoring; deliberately
# short and hard-coded so the DuckDB oracle can inline the same literal.
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization → array<string> (drops empty tokens)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.
    The MinHash / Jaccard dedup unit (SURVEY §2.12 near-dup).

    PERF: higher-order lambdas are interpreted (not codegen'd) and inline
    their argument expression into every element evaluation — so pass a
    *materialized column* (``withColumn("toks", tokens_col(...))``), never
    the raw tokenization expression, or the split/filter re-runs per
    shingle (measured 10×). ``element_at`` per position beats
    ``slice``+``concat_ws`` (no per-element array allocation, ~3×)."""
    # NB: sequence(0, -1) is a DESCENDING 2-element array in Spark, so the
    # short-document case must be guarded explicitly, not via greatest().
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    shingles = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-grams of the raw string (language-ID features).

    PERF: pass a materialized (already-lowered) column where possible —
    the lambda inlines ``text`` into every element evaluation."""
    s = F.lower(text)
    idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
    grams = F.transform(idx, lambda i: s.substr(i, F.lit(n)))
    return F.when(F.length(s) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio_col(tokens: Column) -> Column:
    """Fraction of tokens that are stopwords — a quality-score feature."""
    n_stop = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(tokens) > 0, n_stop / F.size(tokens)).otherwise(F.lit(0.0))


def quality_gate(
    tokens: Column,
    min_tokens: int = 10,
    min_stopword_ratio: float = 0.05,
    min_uniq_ratio: float = 0.3,
    max_avg_token_len: float = 12.0,
) -> Column:
    """C4-style document-quality gate as ONE boolean Catalyst expression:
    long enough, English-like stopword density, not boilerplate-repetitive
    (unique-token ratio), not symbol soup (avg token length). Used as a
    filter it pushes down with the rest of the plan — the corpus-cleaning
    pass of a training-data pipeline, free of any Python in the row path."""
    n = F.size(tokens)
    n_d = n.cast("double")
    avg_len = F.aggregate(
        tokens, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    ) / n_d
    uniq_ratio = F.size(F.array_distinct(tokens)) / n_d
    return (
        (n >= min_tokens)
        & (stopword_ratio_col(tokens) >= min_stopword_ratio)
        & (uniq_ratio >= min_uniq_ratio)
        & (avg_len <= max_avg_token_len)
    )


def fingerprint_md5(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace-collapsed). Stable across engines and runs —
    the exact-dedup / provenance key for a 100 TB corpus."""
    normalized = F.concat_ws(" ", tokens_col(text))
    return F.md5(normalized.cast("binary"))


def hash_embedding(
    df,
    id_col: str,
    text_col: str,
    dim: int = 16,
):
    """Feature-hashing text embedder (the "hashing trick", Weinberger
    et al. 2009): every token lands in bucket ``int(md5(t)[8th hex
    digit], 16) % dim`` with a ±1 sign from the 9th digit; per-doc
    bucket sums are L2-normalized into a dense ``array<double>``. The
    deterministic, vocabulary-free text→vector bridge: its output
    column is exactly what the similarity tier consumes
    (``brute_force_topk_cosine`` / IVF×PQ), so a corpus can be
    embedded and ANN-indexed entirely in-engine with zero Python in
    the row path and one (id, dim) shuffle. md5-derived buckets make
    the whole map DuckDB-reproducible (oracle-checked as
    ``q_text_hash_embed``); integer bucket sums keep the norm exact
    in double regardless of aggregation order, so normalized values
    agree across engines at any parallelism. ``dim`` ≤ 16 uses one
    hex digit; the production form at larger dims swaps the digit
    extraction for ``xxhash64(t) % dim`` (same plan shape).

    Returns (id_col, embedding array<double>), one row per input row
    with a non-empty token set; rounding at 4 decimals rides INSIDE
    the normalize so downstream rankings are partition-order-proof."""
    if not 1 <= dim <= 16:
        raise ValueError("hash_embedding: dim must be in [1, 16]")
    from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round

    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("__t")
    )
    h = F.md5(F.col("__t"))
    bucket = (
        F.conv(F.substring(h, 8, 1), 16, 10).cast("int") % F.lit(dim)
    ).alias("__dim")
    sign = (
        F.when(
            F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("__s")
    )
    per = (
        toks.select(id_col, bucket, sign)
        .groupBy(id_col, "__dim")
        .agg(F.sum("__s").alias("__v"))
    )
    m = per.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__dim", "__v"))
        ).alias("__m")
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("__m", i), F.lit(0)).cast(
            "double"
        ),
    )
    out = m.select(F.col(id_col), raw.alias("__raw")).select(
        F.col(id_col),
        F.col("__raw"),
        F.greatest(
            F.sqrt(
                F.aggregate(
                    "__raw", F.lit(0.0), lambda a, x: a + x * x
                )
            ),
            F.lit(1e-12),
        ).alias("__n"),
    )
    return out.select(
        F.col(id_col),
        F.transform(
            "__raw", lambda x: stable_round(x / F.col("__n"), 4)
        ).alias("embedding"),
    )
