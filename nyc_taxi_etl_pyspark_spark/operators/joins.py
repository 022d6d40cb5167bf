"""Join operators (SURVEY.md §2.3).

The reference's only join is a broadcast LEFT equi-join against a 6-row
literal lookup (``src/features/transformations.py:40-46``); Catalyst's
equi-join strategies (broadcast / shuffled-hash / sort-merge) cover the
rest of the equi surface natively. What Spark lacks natively — range joins
and as-of joins — is implemented here with scale-correct plans:

- ``range_join_bucketed``: a naive equi-join + range filter degenerates to
  a per-key cartesian product inside sort-merge join (O(n²) per key — fatal
  for hot keys at 100 TB). Bucketizing the range key to the window width
  and equi-joining on (key, bucket) ∪ (key, bucket+1) bounds each probe to
  two buckets, turning the plan back into a pure hash join whose cost is
  linear in the true match count.
- ``asof_join``: the classic merge-based formulation — union both sides
  tagged, single shuffle on the key, one window pass carrying the last
  right-side value forward. One shuffle + one sort, no nested loop, no
  per-row subquery.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup_join(
    fact: DataFrame,
    lookup: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Fact ⟕ small-dimension join with an explicit broadcast hint
    (ref ``transformations.py:2,46``). The hint is kept even though
    Catalyst would auto-broadcast below the threshold — determinism
    across session configs matters more than trusting defaults."""
    return fact.join(F.broadcast(lookup), on=on, how=how)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Equi-key + time-range join: match right rows with
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` (seconds).

    Implementation: bucket both sides by ``width = upper_s - lower_s``
    over the epoch axis; a right row can only fall in the left row's
    bucket or the next one, so the left side explodes into exactly two
    (key, bucket) probes and the join is a plain equi hash join with a
    cheap residual filter. Shuffle volume is 2×|left| + |right| — flat in
    the window width, independent of key skew.
    """
    width = max(upper_s - lower_s, 1)
    lkey = [F.col(c) for c in key_cols]

    l_epoch = F.col(left_ts).cast("double")
    r_epoch = F.col(right_ts).cast("double")

    right_b = right.withColumn(
        "__bucket", F.floor((r_epoch - F.lit(lower_s)) / F.lit(width)).cast("long")
    )
    left_b = left.withColumn("__b0", F.floor(l_epoch / F.lit(width)).cast("long"))
    left_b = left_b.withColumn(
        "__bucket", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1))
    ).drop("__b0")

    joined = left_b.join(right_b, on=[*key_cols, "__bucket"], how="inner").drop(
        "__bucket"
    )
    cond = (F.col(right_ts).cast("double") >= F.col(left_ts).cast("double") + lower_s) & (
        F.col(right_ts).cast("double") <= F.col(left_ts).cast("double") + upper_s
    )
    return joined.filter(cond)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` sharing ``key_cols`` (NULLs when none).

    Merge-based: tag sides, union on aligned schemas, and run one
    ``last(..., ignorenulls)`` window ordered by (ts, side) per key. Right
    rows at the exact same timestamp sort before left rows, matching the
    inclusive ``<=`` semantics. Cost: one shuffle on the key + one sort —
    the plan a native as-of operator would produce.
    """
    mkcol = [F.col(c) for c in key_cols]

    right_tagged = right.select(
        *mkcol,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    left_tagged = left.select(
        *mkcol,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    unioned = right_tagged.unionByName(left_tagged)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"__carried_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__carried_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt: int,
    probe_hash_col: str,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: replicate the build side ``salt``× and
    scatter probe rows across the replicas by a deterministic hash.

    A hot join key (one customer with 10⁹ orders) lands an entire key's
    rows in ONE sort-merge/hash task; salting splits that key across
    ``salt`` tasks at the cost of a ``salt``× blow-up of the (small-ish)
    build side. AQE's runtime skew-join split (enabled engine-wide,
    session.py) is the first line of defense — reach for explicit salting
    when skew is known ahead of time or AQE's post-shuffle splitting can't
    help (e.g. aggregation-free stream-stream joins).

    ``probe_hash_col`` must be any probe column with per-row-varying
    values (a row id / primary key); determinism of xxhash64 keeps results
    reproducible. Semantics are identical to the unsalted join — verified
    by the q_join_salted oracle, which runs the PLAIN SQL join.

    Only ``inner`` and ``left`` (probe-outer) are supported: the build
    side is replicated ``salt``×, so build-outer variants (``right``/
    ``full``) would emit every unmatched build row ``salt`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (probe-outer); got {how!r}. "
            "Build-side replication would duplicate unmatched build rows "
            "under right/full outer joins."
        )
    build_s = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    probe_s = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(probe_hash_col)), F.lit(salt)).cast("int"),
    )
    return probe_s.join(build_s, on=[*on, "__salt"], how=how).drop("__salt")


def theta_lt_count_banded(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    right_keys: Sequence[str],
    out_col: str = "n_lt",
    band_width: float = 1.0,
) -> DataFrame:
    """Per-right-row count of left rows with ``left_val < right_val``,
    WITHOUT the keyless theta join (round-14 optimization: the
    BroadcastNestedLoopJoin spelling costs |left| × |right| comparisons —
    104.9 s at sf1 vs ~1 s for this plan; guide §2.4/§3 "remove the
    join, keep the aggregate").

    Counting-sort decomposition over value bands of ``band_width``:

    1. left rows collapse to per-band counts (ONE narrow map-side-combine
       shuffle of (band, count) longs — the only pass over left);
    2. a running sum over the band axis (rows strictly below the current
       band) gives each band its "everything in lower bands" count — the
       window is a single partition but its row count is bounded by the
       VALUE DOMAIN / band_width (e.g. ~11k bands for TPC-H acctbal at
       width 1.0), never by |left|, and it broadcasts back;
    3. only SAME-band pairs need exact comparison: a plain equi hash
       join on the band id, so pair space is per-band occupancy, not
       |left| × |right| (the sorted-neighborhood bound — shrink
       ``band_width`` as density grows to keep occupancy flat).

    Rows with NULL on either value never match (SQL ``<`` semantics);
    right rows with zero matches are RETURNED with count 0 (callers
    wanting inner-join semantics filter ``out_col > 0``). Exactness: the
    band id only routes rows (floor is monotone, so band(l) < band(r)
    implies l < r and band(l) > band(r) implies l > r); every kept or
    dropped pair is decided by integer band compare or the exact ``<``
    on the original values — no float tolerance anywhere.
    """
    if band_width <= 0:
        raise ValueError(
            f"theta_lt_count_banded: band_width must be > 0, got {band_width}"
        )
    lb = (
        left.select(F.col(left_val).alias("__lv"))
        .filter(F.col("__lv").isNotNull())
        .withColumn("__band", F.floor(F.col("__lv") / band_width).cast("long"))
    )
    rb = right.select(
        *right_keys,
        F.col(right_val).alias("__rv"),
        F.floor(F.col(right_val) / band_width).cast("long").alias("__band"),
        # unique per-row tag so duplicate right rows each count their own
        # matches before the final per-key rollup (deterministic enough:
        # it never reaches the output, only partitions the aggregation)
        F.monotonically_increasing_id().alias("__rid"),
    )
    band_counts = lb.groupBy("__band").agg(F.count("*").alias("__cnt"))
    # band universe = left bands ∪ right bands, so every right band finds
    # its running sum directly (no as-of lookup needed)
    bands = (
        band_counts.select("__band")
        .unionByName(
            rb.select("__band").filter(F.col("__band").isNotNull()).distinct()
        )
        .distinct()
    )
    w = Window.orderBy("__band").rowsBetween(Window.unboundedPreceding, -1)
    cum = (
        bands.join(band_counts, "__band", "left")
        .select("__band", F.coalesce(F.col("__cnt"), F.lit(0).cast("long")).alias("__cnt"))
        .select(
            "__band",
            F.coalesce(F.sum("__cnt").over(w), F.lit(0).cast("long")).alias(
                "__below"
            ),
        )
    )
    r2 = rb.join(F.broadcast(cum), "__band", "left").withColumn(
        "__below", F.coalesce(F.col("__below"), F.lit(0).cast("long"))
    )
    hit = F.when(F.col("__lv") < F.col("__rv"), F.lit(1)).otherwise(F.lit(0))
    per_row = (
        r2.join(lb.withColumnRenamed("__band", "__lband"),
                F.col("__lband") == F.col("__band"), "left")
        .groupBy("__rid", *right_keys, "__below")
        .agg(F.sum(hit).alias("__same"))
    )
    return (
        per_row.select(
            *right_keys,
            (F.col("__below") + F.col("__same")).cast("long").alias(out_col),
        )
        .groupBy(*right_keys)
        .agg(F.sum(out_col).cast("long").alias(out_col))
    )


def sorted_neighborhood_candidates(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    window: int,
) -> DataFrame:
    """Sorted-neighborhood blocking (SNB): all (left, right) pairs whose
    numeric sort keys differ by at most ``window``, produced WITHOUT a
    theta-join — keys are banded into buckets of width ``window``, the
    right side is replicated into bucket ±1, and candidates meet in a
    plain shuffle equi-join on the bucket id.

    LOSSLESS within the window by construction: if |lk − rk| ≤ w then
    rk lies in floor(lk/w) ± 1, so bucket replication covers every
    in-window pair (property-tested on two fixture keys,
    tests/test_property_joins.py). Pair space is bounded by per-bucket
    occupancy (~w · key density), independent of total rows — the 100 TB
    shape, with no broadcast assumption and no cartesian.

    **Choosing the sort key** (the part a deployment must supply):

    - *Monotone-ish in the true match distance* — records that should
      link must land within ``window`` of each other on this key.
      Numeric tails of structured names, normalized phonetic codes,
      timestamps, and geo cell ids work; a hash does NOT (it destroys
      locality — use LSH bucketing instead when no ordered key exists).
    - *High cardinality / low per-bucket occupancy* — candidates per
      bucket scale with w·density, so a key where thousands of records
      share one value (e.g. a city id) recreates the quadratic block.
      Prefer keys whose buckets hold O(10–100) records; widen buckets
      only as match recall demands.
    - *Cheap to derive* — the key is computed per row in the scan
      projection; anything needing a join or aggregate belongs in a
      precomputed column.

    Column-name note: both inputs travel through the join unrenamed, so
    they must not share column names (select/alias first)."""
    if window <= 0:
        raise ValueError(f"sorted_neighborhood_candidates: window must be > 0, got {window}")
    lb = left.withColumn("__snb_bucket", F.floor(F.col(left_key) / window))
    rb0 = F.floor(F.col(right_key) / window)
    rb = right.withColumn(
        "__snb_bucket", F.explode(F.array(rb0 - 1, rb0, rb0 + 1))
    )
    return (
        lb.join(rb, "__snb_bucket")
        .where(F.abs(F.col(left_key) - F.col(right_key)) <= window)
        .drop("__snb_bucket")
    )
