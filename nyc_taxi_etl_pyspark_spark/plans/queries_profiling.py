"""Data-profiling and entity-resolution operators (SURVEY.md §2
extension): blocked fuzzy record linkage, per-document n-gram novelty
scoring, and a key-skew profiler.

These close two gaps in the engine's dedup/QA story: token- and
hash-based near-dup detection (operators/dedup.py) cannot match *records*
whose keys differ by typos — that needs edit distance under a blocking
key — and none of the existing profiles quantify the key-distribution
skew that decides when salted joins/aggregations (operators/joins.py)
are worth their overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round
from nyc_taxi_etl_pyspark_spark.functions.text import token_shingles, tokens_col
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table


@query(
    "q_record_linkage",
    oracle="""
    SELECT c.c_custkey AS custkey, s.s_suppkey AS suppkey,
           c.c_nationkey AS nationkey,
           levenshtein(c.c_name, s.s_name) AS edit_distance
    FROM customer c
    JOIN supplier s ON c.c_nationkey = s.s_nationkey
    WHERE levenshtein(c.c_name, s.s_name) <= 6
    """,
    tier="demo",  # nationkey-blocked tier: measured super-linear (~11× on
    # a 10× step, SCALE.md r04) — the scale-safe production twin is
    # q_record_linkage_snb (sorted-neighborhood), which holds the headline
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match record linkage: candidate (customer, supplier)
    pairs whose names are within edit distance 6, compared ONLY inside a
    shared blocking key (nationkey) — the classic entity-resolution shape
    (block → compare → threshold) that token/hash dedup cannot express
    because a one-character typo changes every shingle. The block join
    bounds the pair space to Σ_block |C_b|·|S_b| instead of |C|·|S|.
    The supplier side carries NO explicit broadcast hint — TPC-H
    supplier is SF-proportional, so AQE's runtime size check decides:
    broadcast while it is actually small, shuffle equi-join on the
    blocking key once it is not. At 100 TB the same plan holds with
    any selective blocking key (zip, sorted-neighborhood window, LSH
    bucket) feeding the equi-join.

    The distance uses the THRESHOLDED ``levenshtein(l, r, 6)`` form:
    banded DP that abandons a pair the moment its distance provably
    exceeds the bound (returns -1) — O(threshold·len) per pair instead
    of O(len²), measured 3.8× on the block-pair stream; within the
    bound it returns the exact distance, so the oracle is unchanged."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    dist = F.levenshtein(F.col("c_name"), F.col("s_name"), 6)
    return (
        cust.join(
            supp,
            cust.c_nationkey == supp.s_nationkey,
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("s_suppkey").alias("suppkey"),
            F.col("c_nationkey").alias("nationkey"),
            dist.alias("edit_distance"),
        )
        .where(F.col("edit_distance") >= 0)
    )


@query(
    "q_record_linkage_snb",
    oracle="""
    SELECT c.c_custkey AS custkey, s.s_suppkey AS suppkey,
           levenshtein(c.c_name, s.s_name) AS edit_distance
    FROM customer c
    JOIN supplier s
      ON abs(CAST(regexp_extract(c.c_name, '[0-9]+') AS BIGINT)
             - CAST(regexp_extract(s.s_name, '[0-9]+') AS BIGINT)) <= 16
    WHERE levenshtein(c.c_name, s.s_name) <= 6
    """,
)
def q_record_linkage_snb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage — the SCALE-SAFE blocking mode
    for q_record_linkage. That query blocks on nationkey (25 blocks), so
    its pair space is ~|C|·|S|/25 and the build side must broadcast —
    both break at 100 TB. Here the blocking key is the record's SORT KEY
    (the name's numeric tail): records are banded into buckets of width
    w=16 on that key, the smaller side is replicated into its bucket ±1
    (a pair within key distance w always lands in the same or an
    adjacent bucket, so replication makes the band join LOSSLESS), and
    candidates meet in a plain shuffle EQUI-JOIN on the bucket id — no
    broadcast assumption, pair space bounded by per-bucket occupancy
    (~w·density), independent of how many nations or total rows exist.
    The oracle is the unblocked banded theta-join, hash-proving the
    bucket scheme drops no in-window pair. Same thresholded
    ``levenshtein(l, r, 6)`` banded-DP comparison as q_record_linkage.

    The sort key here — the name's numeric tail via ``regexp_extract``
    — is the right choice for THIS fixture (customer/supplier names
    share the ``...#NNN`` shape, so numeric-tail distance upper-bounds
    the name edit distance for near pairs). In a real deployment the
    key is the one design decision the user supplies; the selection
    criteria (monotone-ish in match distance, high cardinality, cheap
    per-row derivation) are documented on the reusable operator,
    ``operators/joins.py::sorted_neighborhood_candidates``, and the
    zero-window-loss property is re-proven on a second, independent
    fixture key (acctbal) in tests/test_property_joins.py."""
    from nyc_taxi_etl_pyspark_spark.operators.joins import (
        sorted_neighborhood_candidates,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("ck"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.regexp_extract("s_name", r"([0-9]+)", 1).cast("long").alias("sk"),
    )
    dist = F.levenshtein(F.col("c_name"), F.col("s_name"), 6)
    return (
        sorted_neighborhood_candidates(cust, supp, "ck", "sk", window=16)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("s_suppkey").alias("suppkey"),
            dist.alias("edit_distance"),
        )
        .where(F.col("edit_distance") >= 0)
    )


@query(
    "q_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ), shingles AS (
      SELECT DISTINCT doc_id,
             a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS shingle
      FROM toks, UNNEST(range(1, len(a) - 1)) AS t(i)
    ), df AS (
      SELECT shingle, count(*) AS n_docs FROM shingles GROUP BY shingle
    )
    SELECT s.doc_id,
           count(*) AS n_shingles,
           round(avg(CASE WHEN d.n_docs = 1 THEN 1.0 ELSE 0.0 END) + 1e-9, 4)
             AS novelty
    FROM shingles s JOIN df d ON s.shingle = d.shingle
    GROUP BY s.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    3-gram shingles that occur in NO other document — the inverse of the
    contamination/duplication signal, used to rank documents for training-
    mix value (boilerplate scores ~0, unique prose ~1). Same inverted-index
    posting stream as q_contamination_ngram, but the document frequency is
    attached with an unordered WINDOW count over the shingle partition
    instead of a df-aggregate + join-back — so the postings are computed
    and scanned ONCE (a join formulation evaluates the explode+distinct
    twice, once per side; measured in the plan). Three bounded-width
    exchanges total — distinct, shingle window, per-doc agg — and never a
    pairwise doc comparison; a mass-duplicated shingle is a hot window
    partition, the same hot key the join would have had."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = (
        docs.withColumn("toks", tokens_col(F.col("text")))
        .select(
            "doc_id",
            F.explode(token_shingles(F.col("toks"), 3)).alias("shingle"),
        )
        .distinct()
    )
    n_docs = F.count("*").over(Window.partitionBy("shingle"))
    return (
        shingles.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            stable_round(
                F.avg(F.when(F.col("n_docs") == 1, 1.0).otherwise(0.0)), 4
            ).alias("novelty"),
        )
    )


@query(
    "q_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS key, count(*) AS n
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           round(avg(n) + 1e-9, 4) AS avg_key_rows,
           round(max(n) / avg(n) + 1e-9, 4) AS skew_ratio,
           round(max(n) / sum(n) + 1e-9, 6) AS top_key_share,
           CAST(min(key) FILTER (WHERE n = (SELECT max(n) FROM per_key))
                AS BIGINT) AS hottest_key
    FROM per_key
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregation-key skew profile: per-key row counts reduced to
    the handful of scalars a planner (or a human) needs to decide whether
    a key needs salting or AQE skew handling — key count, max/avg ratio,
    and the hottest key's share of all rows. The per-key aggregate
    combines map-side and its output is |keys| rows; the final reduction
    is a single bounded row, with the hottest key recovered via a
    struct-ordered max (min key breaks count ties deterministically) —
    no second scan, no driver-side sort. This is the measurement step
    that justifies q_join_salted / q_agg_salted: skew_ratio ≈ 1 means
    salting only adds overhead; ≫ 1 means one reducer owns the job."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    # max_by on (n, -key) would tie-break toward larger keys; order the
    # struct as (n, negated key) so the max struct carries the SMALLEST
    # key among equal counts — deterministic and collect-free.
    hottest = F.max(F.struct(F.col("n"), (-F.col("key")).alias("nk")))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_key_rows"),
        stable_round(F.avg("n"), 4).alias("avg_key_rows"),
        stable_round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
        stable_round(F.max("n") / F.sum("n"), 6).alias("top_key_share"),
        (-hottest.getField("nk")).cast("bigint").alias("hottest_key"),
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5) + 1e-9, 6) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
      SELECT event_type, round(quantile_cont(adev, 0.5) + 1e-9, 6) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(max(d.med) + 1e-9, 4) AS median_value,
           round(max(m.mad) + 1e-9, 4) AS mad,
           CAST(count(*) FILTER (WHERE d.adev > 3 * m.mad) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per group,
    median → absolute deviations → median of deviations (MAD) → count of
    points beyond 3·MAD. The robust complement to q_window_zscore
    (mean/stddev are dragged by the outliers they're meant to find;
    median/MAD have a 50% breakdown point) and to q_winsorize (which
    clamps, where this MEASURES). Two exact-percentile aggregates over
    the same group key — both |group|-bounded — re-probing the fact scan
    through broadcast joins, so the big side never shuffles; at 100 TB
    the exact percentile swaps for the approx_percentile sketch with the
    plan shape unchanged. Both engines QUANTIZE the interpolated medians
    (stable round, 6 decimals) before the deviation/3·MAD comparisons so
    a 1-ulp cross-engine percentile divergence cannot flip the integer
    outlier count (the q_winsorize lesson)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        stable_round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            stable_round(F.max("med"), 4).alias("median_value"),
            stable_round(F.max("mad"), 4).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )


@query(
    "q_gini_concentration",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER
               (PARTITION BY event_type ORDER BY value, event_id) AS i
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round((2.0 * sum(i * value)) / (count(*) * sum(value))
                 - (count(*) + 1.0) / count(*) + 1e-9, 4) AS gini
    FROM ranked
    GROUP BY event_type
    """,
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of ``value`` per event type — the
    distribution-concentration profile (0 = perfectly even, →1 = one row
    carries everything) that complements q_skew_profile: skew_ratio says
    whether ONE key dominates, Gini says how unevenly the whole mass is
    spread. Computed from the rank identity
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over values sorted within each group
    (event_id tie-break ⇒ deterministic ranks even on duplicate values):
    one window pass + one aggregate, both on the same event_type
    partitioning — no pairwise |x−y| comparison, which is the naive
    O(n²) Gini formulation that cannot scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("i")
    )
    n = F.count("*")
    return ranked.groupBy("event_type").agg(
        n.cast("bigint").alias("n"),
        stable_round(
            (2.0 * F.sum(F.col("i") * F.col("value"))) / (n * F.sum("value"))
            - (n + 1.0) / n,
            4,
        ).alias("gini"),
    )


@query(
    "q_entropy_balance",
    oracle="""
    WITH cnt AS (
      SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT lang, sum(n) AS total FROM cnt GROUP BY lang
    )
    SELECT c.lang,
           CAST(t.total AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_sources,
           round(-sum((n / t.total) * ln(n / t.total)) + 1e-9, 4) AS entropy,
           round(-sum((n / t.total) * ln(n / t.total))
                 / ln(count(*)) + 1e-9, 4) AS balance
    FROM cnt c JOIN tot t ON c.lang = t.lang
    GROUP BY c.lang, t.total
    HAVING count(*) > 1
    """,
)
def q_entropy_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy / normalized balance of the source mix per
    language — the class-balance metric a training-mix pipeline tracks
    (balance = H/ln(k): 1.0 means sources contribute evenly, →0 means
    one source dominates; the multiplicative cousin of Gini). Two
    bounded aggregates on one (lang, source) partialization — the count
    table is |lang|×|source| rows no matter the corpus size — and the
    entropy sum runs over that tiny table. Groups with a single source
    are dropped (ln(1) = 0 denominator), mirroring the oracle HAVING."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("lang").agg(F.sum("n").alias("total"))
    p = F.col("n") / F.col("total")
    ent = -F.sum(p * F.log(p))
    return (
        cnt.join(tot, "lang")
        .groupBy("lang", "total")
        .agg(
            F.count("*").alias("n_sources"),
            stable_round(ent, 4).alias("entropy"),
            stable_round(ent / F.log(F.count("*")), 4).alias("balance"),
        )
        .where(F.col("n_sources") > 1)
        .select(
            "lang",
            F.col("total").cast("bigint").alias("n_docs"),
            "n_sources",
            "entropy",
            "balance",
        )
    )


@query(
    "q_benford_profile",
    oracle="""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS d
      FROM lineitem WHERE l_extendedprice >= 1
    )
    SELECT d AS leading_digit,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM digits)
                 + 1e-9, 4) AS observed_p,
           round(log10(1.0 + 1.0 / d) + 1e-9, 4) AS benford_p
    FROM digits
    GROUP BY d
    """,
)
def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit profile: observed first-significant-digit
    frequencies of a monetary column next to Benford's law expectation
    log10(1 + 1/d) — the classic fabricated-/corrupted-data screen
    (natural multiplicative data follows it; uniform synthetics and
    manual edits don't). Output is AT MOST 9 rows regardless of input
    size; the global total re-enters as a broadcast scalar, never a
    collect. (The fixture's uniform prices deliberately DON'T follow
    Benford — the profile is the detector, not an assertion.)"""
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.where(F.col("l_extendedprice") >= 1).select(
        # floor, not cast: DuckDB's CAST(double AS BIGINT) rounds while
        # Spark's truncates — floor() is the portable integer part
        F.substring(
            F.floor(F.col("l_extendedprice")).cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    total = digits.agg(F.count("*").alias("__total"))
    return (
        digits.groupBy("d")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("d").alias("leading_digit"),
            "n",
            stable_round(F.col("n") / F.col("__total"), 4).alias("observed_p"),
            stable_round(F.log10(1.0 + 1.0 / F.col("d")), 4).alias("benford_p"),
        )
    )


@query(
    "q_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) % 4 AS hour_bucket,
             CAST(count(*) AS DOUBLE) AS o
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, sum(o) AS row_tot FROM obs GROUP BY event_type
    ), c AS (
      SELECT hour_bucket, sum(o) AS col_tot FROM obs GROUP BY hour_bucket
    ), t AS (SELECT sum(o) AS grand FROM obs)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(pow(o - row_tot * col_tot / grand, 2)
                     / (row_tot * col_tot / grand)) + 1e-9, 4) AS chi2
    FROM obs JOIN m USING (event_type) JOIN c USING (hour_bucket), t
    """,
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic over the (event_type ×
    hour-bucket) contingency table — "does activity mix depend on time
    of day?", the categorical-drift / A-B sanity test. The contingency
    table is |types|×|buckets| cells built by ONE aggregate over the
    fact stream; marginals and the statistic are then plain arithmetic
    over that bounded table (broadcast joins, no second fact scan). At
    100 TB the expensive part stays exactly one map-side-combined
    count."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.hour("ts") % 4).cast("int").alias("hour_bucket")
    ).agg(F.count("*").cast("double").alias("o"))
    m = obs.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    c = obs.groupBy("hour_bucket").agg(F.sum("o").alias("col_tot"))
    t = obs.agg(F.sum("o").alias("grand"))
    exp = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    return (
        obs.join(F.broadcast(m), "event_type")
        .join(F.broadcast(c), "hour_bucket")
        .crossJoin(F.broadcast(t))
        .agg(
            F.count("*").alias("n_cells"),
            stable_round(
                F.sum(F.pow(F.col("o") - exp, F.lit(2.0)) / exp), 4
            ).alias("chi2"),
        )
    )


@query(
    "q_vocab_overlap",
    oracle="""
    WITH st AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), sizes AS (
      SELECT source, count(*) AS n FROM st GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
      FROM st a JOIN st b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           round(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common) + 1e-9, 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.source_a = sa.source
    JOIN sizes sb ON i.source_b = sb.source
    """,
)
def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary overlap (Jaccard) between every pair of corpus sources
    — the corpus-diversity matrix: near-1 pairs are redundant crawls
    (dedup candidates at the SOURCE level, before any per-document
    work), near-0 pairs genuinely widen coverage. The (source, token)
    distinct postings co-locate on token for the pair join; the pair
    space is |sources|² and per-token fan-out is bounded by sources per
    token — the group-level cousin of document n-gram Jaccard, three
    orders of magnitude cheaper than any per-document comparison."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").alias("n"))
    a = st.select(F.col("source").alias("source_a"), "token")
    b = st.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            stable_round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )
