"""Sketch, weighted-sampling, and graph-analytics operators
(SURVEY.md §2.12 extension).

The exact heavy-hitter / percentile operators elsewhere in the engine are
the |vocab|-bounded baselines; this module adds the O(1)-memory sketch
(count-min), the weighted corpus sampler (Efraimidis–Spirakis), and a
third graph-analytics surface (triangle counting) next to connected
components and PageRank. Every operator here is DETERMINISTIC — hash
families are derived from md5, which both Spark and DuckDB compute
identically — so even the "approximate" sketch path is value-hash
verified against the oracle, not just rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.plans.queries_text import _cooccurrence_pairs
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

_CM_DEPTH = 4  # independent hash rows
_CM_WIDTH = 64  # buckets per row — small so fixture vocab actually collides


def _cm_bucket_spark(i: int) -> F.Column:
    """Row-``i`` count-min bucket of ``token``: md5-derived 32-bit hash
    mod width. md5 (not xxhash64) so DuckDB reproduces it bit-for-bit."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cm{i}:"), F.col("token"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (h % _CM_WIDTH).alias(f"__b{i}")


@query(
    "q_cm_sketch",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), hashed AS (
      SELECT token, i,
             CAST(concat('0x', substring(md5('cm' || i || ':' || token), 1, 8))
                  AS BIGINT) % {_CM_WIDTH} AS bucket
      FROM toks, UNNEST([0,1,2,3]) AS t(i)
    ), sketch AS (
      SELECT i, bucket, count(*) AS c FROM hashed GROUP BY i, bucket
    ), exact AS (
      SELECT token, count(*) AS n_exact FROM toks GROUP BY token
    ), cand AS (
      SELECT token, n_exact FROM exact
      WHERE n_exact > (SELECT 0.002 * sum(n_exact) FROM exact)
    ), cand_hashed AS (
      SELECT c.token, c.n_exact, t.i,
             CAST(concat('0x', substring(md5('cm' || t.i || ':' || c.token), 1, 8))
                  AS BIGINT) % {_CM_WIDTH} AS bucket
      FROM cand c, UNNEST([0,1,2,3]) AS t(i)
    )
    SELECT ch.token, ch.n_exact, min(s.c) AS cm_estimate,
           CAST(min(s.c) - ch.n_exact AS BIGINT) AS overcount
    FROM cand_hashed ch JOIN sketch s
      ON ch.i = s.i AND ch.bucket = s.bucket
    GROUP BY ch.token, ch.n_exact
    """,
)
def q_cm_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, exact-verified: build a
    4×64 counter sketch over the token stream (each occurrence
    increments one bucket per hash row), then estimate each heavy token's
    frequency as the min over its buckets and report the overcount
    against the exact count (CM never undercounts — the oracle proves
    overcount ≥ 0 row by row). The sketch build is ONE aggregate with a
    4×64-row output regardless of corpus size — this is the operator that
    replaces the |vocab|-bounded exact count (q_text_heavy_hitters) when
    even the vocabulary doesn't fit: at 100 TB the sketch is still 256
    counters, mergeable across partitions by addition. The md5-derived
    hash family makes the sketch deterministic on any engine — which is
    why an "approximate" operator can still be value-hash verified."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    exact = toks.groupBy("token").agg(F.count("*").alias("n_exact"))
    # CM counters are additive, so the sketch folds from the per-token
    # count table (weight = n_exact) instead of per occurrence — ONE
    # explode over the corpus, then |vocab|×depth hash rows. (The pure
    # stream build — weight 1 per occurrence, no vocab table — is the
    # SAME aggregate and what you'd run when |vocab| itself doesn't fit;
    # this query materializes exact counts anyway for verification.)
    hashed = exact.select(
        "token",
        "n_exact",
        F.posexplode(F.array(*[_cm_bucket_spark(i) for i in range(_CM_DEPTH)])).alias(
            "i", "bucket"
        ),
    )
    sketch = hashed.groupBy("i", "bucket").agg(F.sum("n_exact").alias("c"))
    total = exact.agg(F.sum("n_exact").alias("__total"))
    cand_hashed = (
        hashed.crossJoin(F.broadcast(total))
        .where(F.col("n_exact") > 0.002 * F.col("__total"))
        .select("token", "n_exact", "i", "bucket")
    )
    return (
        cand_hashed.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("token", "n_exact")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "token",
            "n_exact",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("n_exact"))
            .cast("bigint")
            .alias("overcount"),
        )
    )


@query(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) + 1.0) / 4294967296.0)
                   / n_chars, 10) AS sample_key
      FROM documents
    )
    SELECT doc_id, n_chars, sample_key
    FROM keyed
    ORDER BY sample_key DESC, doc_id
    LIMIT 50
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each document draws a deterministic uniform u from md5(doc_id) and is
    ranked by ln(u)/weight (the monotone-log form of u^(1/w)); the top-k
    by key IS a weighted sample — longer documents (weight = n_chars)
    proportionally more likely, yet fully reproducible on any engine,
    any partitioning, any run. This is how a training-mix pipeline takes
    a "sample 1M docs, length-weighted" cut that a re-run or an audit
    can regenerate exactly. Plans as TakeOrderedAndProject: per-partition
    top-k then a k-row driver merge — no global sort at any scale. Key
    rounded to 10 dp so last-ulp ln() differences between engines cannot
    reorder near-ties (doc_id breaks exact ties)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967296.0
    key = F.round(F.log(u) / F.col("n_chars"), 10)
    return (
        docs.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(50)
    )


@query(
    "q_triangle_count",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    df AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    vocab AS (
      SELECT df.token FROM df, n WHERE df.df > 0.05 * n.n_docs
    ),
    vdt AS (
      SELECT dt.doc_id, dt.token FROM dt JOIN vocab v ON dt.token = v.token
    ),
    edges AS (
      SELECT a.token AS ta, b.token AS tb
      FROM vdt a JOIN vdt b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2
      HAVING count(*) >= 5
    )
    SELECT CAST((SELECT count(DISTINCT t) FROM
                  (SELECT ta AS t FROM edges UNION SELECT tb FROM edges))
                AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM edges e1
                 JOIN edges e2 ON e2.ta = e1.tb
                 JOIN edges e3 ON e3.ta = e1.ta AND e3.tb = e2.tb)
                AS BIGINT) AS n_triangles
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the token co-occurrence graph — the graph
    clustering-coefficient / community-density primitive, and the
    engine's third graph surface after connected components (dedup
    clusters) and PageRank (TextRank). Uses the SAME df-pruned edge
    derivation as q_token_cooccurrence (one definition, can't drift).
    The count uses the oriented-triangle identity: every triangle is
    enumerated exactly once as a<b<c via two joins over the a<b edge
    list — on a |V|²-bounded, df-pruned graph both joins are tiny; on an
    unpruned graph the standard mitigation (orient edges low-degree →
    high-degree) drops into the same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    pairs, _n = _cooccurrence_pairs(docs)
    # Materialize the df-pruned edge list ONCE (round 15, guide §2.4 /
    # §3): the edges subtree is consumed FIVE times (e1/e2/e3 of the
    # wedge join + the node count + the edge count), and Spark's
    # exchange reuse does not unify them — the r15 before-plan shows
    # 176 Exchange nodes over 37 parquet scans, i.e. the whole
    # tokenize→df-prune→self-join→groupBy pipeline re-executed per
    # consumer. One eager localCheckpoint truncates that to a single
    # execution; the edge list itself is |V|²-bounded (df-pruned vocab,
    # n_both ≥ 5), thousands of rows at any corpus scale. Same
    # discipline as connected_components' canon checkpoint; at cluster
    # scale switch to checkpoint() (see dedup.py note).
    edges = pairs.select(
        F.col("token_a").alias("ta"), F.col("token_b").alias("tb")
    ).localCheckpoint(eager=True)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.ta") == F.col("e1.tb"))
        .join(
            e3,
            (F.col("e3.ta") == F.col("e1.ta"))
            & (F.col("e3.tb") == F.col("e2.tb")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("ta").alias("t"))
        .union(edges.select("tb"))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (
        nodes.crossJoin(n_edges)
        .crossJoin(tri)
        .select("n_nodes", "n_edges", "n_triangles")
    )


@query("q_hll_error", oracle=None)  # Spark-specific HLL state => rows-only
def q_hll_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog accuracy report: per event type, the exact distinct
    user count next to ``approx_count_distinct`` (rsd=0.05) and the
    relative error — the sketch-qualification query a pipeline runs ONCE
    at small scale before trusting the sketch at 100 TB, where the exact
    two-phase distinct (q_agg_distinct_twophase) stops being affordable
    and HLL's mergeable fixed-size state is the only option. Rows-only:
    the HLL register layout is engine-specific (count-min in q_cm_sketch
    shows the md5-portable alternative when cross-engine determinism is
    required)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            "approx_users",
            F.round(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users"),
                4,
            ).alias("rel_error"),
        )
    )


@query(
    "q_weighted_sample_per_group",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             round(ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) + 1.0) / 4294967296.0)
                   / n_chars, 10) AS sample_key
      FROM documents
    )
    SELECT doc_id, source, n_chars, sample_key
    FROM keyed
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY sample_key DESC, doc_id) <= 5
    """,
)
def q_weighted_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement PER STRATUM (the
    Efraimidis–Spirakis A-ES key of q_weighted_sample, partitioned by
    source): top-5 documents per source by ln(u)/weight — the
    "per-domain, length-weighted, reproducible" cut a training-mix
    pipeline takes when each data source gets its own quota instead of
    one global budget. Same deterministic md5 uniform, same 10-dp key
    quantization and doc_id tie-break, but the global
    TakeOrderedAndProject becomes a row_number window partitioned on
    source — one shuffle on the stratum key, per-stratum top-k inside
    each partition, no global sort and no driver involvement at any
    stratum count."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967296.0
    key = F.round(F.log(u) / F.col("n_chars"), 10)
    w = Window.partitionBy("source").orderBy(
        F.desc("sample_key"), "doc_id"
    )
    return (
        docs.select(
            "doc_id", "source", "n_chars", key.alias("sample_key")
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 5)
        .drop("__rn")
    )
