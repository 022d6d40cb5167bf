"""Corpus-preparation operators, round 2 (SURVEY.md §2.12 — the
LLM-training-data pipeline set, widened): text scrubbing, repetition
signals, embedding statistics, per-label centroids, and the composed
dedup→quality→rollup corpus-prep pipeline.

All hot paths are built-in Catalyst expressions (regexp_replace, HOFs,
posexplode, hash aggregates) — zero Python in the row path, so every
query here whole-stage-codegens and scales with partition count.

Oracle notes: per-row HOF arithmetic folds floats in element order in
both engines (bit-identical before rounding); cross-row reductions
(avg over vectors, token-count ratios) are rounded to 4 decimals in BOTH
engines per the registry convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.functions.rounding import stable_round, stable_round0
from nyc_taxi_etl_pyspark_spark.functions.text import (
    STOPWORDS,
    fingerprint_md5,
    quality_gate,
    token_shingles,
    tokens_col,
)
from nyc_taxi_etl_pyspark_spark.plans.registry import query
from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

_STOPWORD_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# Tokenization written ONCE for the DuckDB side, matching tokens_col()
# (lower + multi-whitespace split + drop empties).
_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


@query(
    "q_text_scrub",
    oracle="""
    SELECT event_id,
           regexp_replace(lower(props), '[0-9]+', '<num>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_masked
    FROM events
    """,
)
def q_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/number scrubbing (corpus normalization): mask digit runs with a
    sentinel token and count masked spans — the regex-redaction pass (same
    machinery as email/URL/ID masking) every training-data pipeline runs
    before tokenization. Runs on ``events.props`` (the fixture's only
    digit-bearing text). Pure Catalyst ``regexp_replace`` — pushable,
    codegen'd, no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace(F.lower("props"), "[0-9]+", "<num>").alias("scrubbed"),
        F.regexp_count("props", F.lit("[0-9]+")).cast("int").alias("n_masked"),
    )


@query(
    "q_text_repetition",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
    ), cnt AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
    ), rep AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             round(max(c) / sum(c) + 1e-9, 4) AS top_token_frac
      FROM cnt GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             [toks[i] || ' ' || toks[i+1]
              for i in generate_series(1, len(toks) - 1)] AS bigrams
      FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    )
    SELECT r.doc_id, r.n_tokens, r.top_token_frac,
           CASE WHEN len(bigrams) = 0 THEN NULL
                ELSE round(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                           / len(bigrams) + 1e-9, 4)
           END AS dup_bigram_frac
    FROM rep r JOIN bg USING (doc_id)
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: most-frequent-token
    fraction (explode → two-level hash agg — the shape that scales: the
    shuffle carries (doc, token) partial counts, never raw text) and
    duplicate-bigram fraction (per-row HOF, zero shuffle). High values on
    either flag boilerplate/spam for corpus filtering. A <2-token doc has
    no bigrams; its fraction is NULL, not a divide-by-zero abort (ANSI
    mode) — exactly the boilerplate inputs this filter must survive."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", tokens_col(F.col("text"))
    )
    cnt = (
        d.select("doc_id", F.explode("__toks").alias("token"))
        .groupBy("doc_id", "token")
        .count()
    )
    rep = cnt.groupBy("doc_id").agg(
        F.sum("count").alias("n_tokens"),
        stable_round(F.max("count") / F.sum("count"), 4).alias("top_token_frac"),
    )
    bg = F.col("__bigrams")
    dup = d.withColumn("__bigrams", token_shingles(F.col("__toks"), 2)).select(
        "doc_id",
        stable_round(
            F.lit(1.0)
            - F.size(F.array_distinct(bg)).cast("double")
            / F.nullif(F.size(bg).cast("double"), F.lit(0.0)),
            4,
        ).alias("dup_bigram_frac"),
    )
    return rep.join(dup, "doc_id")


@query(
    "q_embedding_stats",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT) AS dim,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))) + 1e-9, 4) AS l2_norm,
           round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding) + 1e-9, 4) + 0.0
             AS mean_val,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'min') + 1e-9, 4)
             AS min_val,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max') + 1e-9, 4)
             AS max_val
    FROM embeddings
    """,
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector embedding statistics (L2 norm, mean, min, max, dim) —
    the sanity/QA projection a pipeline runs before similarity search
    (catches unnormalized or degenerate vectors). Higher-order functions
    only: one scan, no shuffle, no Python."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sq_sum = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    total = F.aggregate(v, F.lit(0.0), lambda a, x: a + x)
    return e.select(
        "vec_id",
        "label",
        F.size(v).alias("dim"),
        stable_round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        stable_round0(total / F.size(v), 4).alias("mean_val"),
        stable_round(F.array_min(v), 4).alias("min_val"),
        stable_round(F.array_max(v), 4).alias("max_val"),
    )


@query(
    "q_embedding_centroids",
    oracle="""
    SELECT label, dim, round(avg(v) + 1e-9, 4) + 0.0 AS centroid_val
    FROM (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             CAST(generate_subscripts(embedding, 1) AS INT) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors, one row per (label, dimension) — the
    k-means / IVF-codebook building block. posexplode fans each vector
    into 64 (pos, value) rows; the partial aggregate collapses them to
    labels×64 BEFORE the shuffle, so network volume is the codebook size,
    not the corpus size — the property that makes centroid computation
    feasible at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
        )
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(stable_round0(F.avg("v"), 4).alias("centroid_val"))
    )


@query(
    "q_corpus_prep",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, source, text, {_TOKS_SQL} AS toks,
             md5(array_to_string({_TOKS_SQL}, ' ')) AS fprint
      FROM documents
    ), surv AS (
      SELECT * FROM fp
      QUALIFY row_number() OVER (PARTITION BY fprint ORDER BY doc_id) = 1
    ), clean AS (
      SELECT * FROM surv
      WHERE len(toks) >= 10
        AND CAST(len(list_filter(toks, x -> x IN {_STOPWORD_SQL})) AS DOUBLE)
            / len(toks) >= 0.05
        AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
        AND CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) <= 12.0
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
           CAST(sum(ceil(length(text) / 4.0)) AS BIGINT) AS bpe_budget
    FROM clean
    GROUP BY lang, source
    """,
)
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep pipeline, end to end: content-fingerprint
    exact dedup (deterministic min-doc_id survivor) → C4-style quality
    gate → per-(lang, source) token/budget rollup. One window shuffle on
    the fingerprint + one partial→final aggregate; the quality gate is a
    pushed-down boolean so rejected docs never reach the window. This is
    the §2.12 operators composed the way a real 100 TB ingest run chains
    them."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("__fp", fingerprint_md5(F.col("text")))
        .withColumn("__toks", tokens_col(F.col("text")))
    )
    w = Window.partitionBy("__fp").orderBy("doc_id")
    surv = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(quality_gate(F.col("__toks")))
    )
    return surv.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("__toks")).cast("bigint").alias("n_tokens"),
        F.sum(F.ceil(F.length("text") / 4.0)).cast("bigint").alias("bpe_budget"),
    )


@query(
    "q_contamination_ngram",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            for i in generate_series(1, len(toks) - 2)]) AS shingles
      FROM (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE source = 'src0'
    ), corpus AS (
      SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n_shingles
      FROM sh WHERE source <> 'src0'
    )
    SELECT c.doc_id,
           count(DISTINCT c.shingle) AS n_matched,
           CAST(any_value(c.n_shingles) AS INT) AS n_shingles,
           round(CAST(count(DISTINCT c.shingle) AS DOUBLE)
                 / any_value(c.n_shingles) + 1e-9, 4) AS contamination_ratio
    FROM corpus c JOIN bench b ON c.shingle = b.shingle
    GROUP BY c.doc_id
    """,
)
def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan: flag corpus documents sharing any
    3-gram shingle with a held-out benchmark set (here: source='src0'
    docs stand in for the eval set). Inverted-index shape — both sides
    explode to (shingle-hash, doc) posting lists and meet in ONE equi
    join on a long key, so cost is shingle volume, not |corpus|×|bench|;
    the benchmark side is tiny and broadcasts. The oracle joins the raw
    shingle strings (hashing is the engine-side scale optimization)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", tokens_col(F.col("text"))
    )
    sh = d.select(
        "doc_id",
        "source",
        F.array_distinct(token_shingles(F.col("__toks"), 3)).alias("__sh"),
    ).select(
        "doc_id",
        "source",
        F.size("__sh").alias("__n"),
        F.explode_outer(F.transform("__sh", lambda s: F.xxhash64(s))).alias("__h"),
    ).filter(F.col("__h").isNotNull())
    bench = sh.filter(F.col("source") == "src0").select("__h").distinct()
    corpus = sh.filter(F.col("source") != "src0")
    return (
        corpus.join(F.broadcast(bench), "__h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("__h").alias("n_matched"),
            F.first("__n").alias("n_shingles"),
            stable_round(
                F.countDistinct("__h").cast("double") / F.first("__n"), 4
            ).alias("contamination_ratio"),
        )
    )


@query(
    "q_duplicate_spans",
    oracle="""
    WITH spans AS (
      SELECT d.doc_id, substr(d.text, g.pos, 32) AS span
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(
                      1, greatest(length(d.text) - 31, 1), 16)) AS pos) g
    ), per AS (
      SELECT span, doc_id, count(*) AS k FROM spans GROUP BY 1, 2
    ), dup_spans AS (
      SELECT span FROM per GROUP BY span HAVING count(*) >= 2
    ), tot AS (
      SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1
    ), dup AS (
      SELECT p.doc_id, CAST(sum(p.k) AS BIGINT) AS n_dup_spans
      FROM per p JOIN dup_spans USING (span) GROUP BY 1
    )
    SELECT t.doc_id, t.n_spans,
           coalesce(d.n_dup_spans, 0) AS n_dup_spans,
           round(CAST(coalesce(d.n_dup_spans, 0) AS DOUBLE)
                 / t.n_spans + 1e-9, 4) AS dup_ratio
    FROM tot t LEFT JOIN dup d USING (doc_id)
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection (the substring-dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, re-shaped for Spark): slide a 32-char
    window at stride 16 over every document, and flag each sampled
    position whose exact content also occurs in at least one OTHER
    document. Per doc: sampled span count, cross-doc duplicated span
    count, and their ratio — the score a curation pipeline thresholds
    to drop boilerplate-heavy documents that document-level near-dup
    (MinHash, q_dedup_minhash) cannot see because only a passage
    repeats, not the whole text.

    Scale shape: span volume is |corpus chars| / stride rows of one
    8-byte ``xxhash64`` key each (the suffix-array of the paper is
    replaced by a sampled hash-partitioned count — no global sort, no
    in-memory index); three shuffles total — (hash, doc) partial agg,
    a whole-partition window on the hash (rows per hash after the
    per-doc collapse = distinct docs carrying the span), one per-doc
    aggregate — and no join-back. Stride
    halves trade recall of short duplicated runs for shuffle volume —
    any duplicated run of >= 47 chars (L + S - 1) is guaranteed to
    contain a sampled window at the same offset in both copies only
    when copies are stride-aligned; production stride-1 runs make the
    guarantee unconditional at 16x the (still linear) volume. The
    oracle replays the same windows on raw substrings; the engine
    groups on their 64-bit hash (collision-free at any realistic
    corpus: 2^-64 per pair, and a collision would only merge two span
    classes)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length("text") - F.lit(31), F.lit(1)),
                F.lit(16),
            )
        ).alias("__pos"),
        "text",
    ).select(
        "doc_id",
        F.xxhash64(F.expr("substring(text, __pos, 32)")).alias("__h"),
    )
    # Three shuffles total, no join-back: (h, doc) partial-agg, a
    # whole-partition window on h (count of rows per hash AFTER the
    # per-doc collapse == distinct docs carrying the span), then one
    # per-doc aggregate computing total and duplicated counts together.
    per = spans.groupBy("__h", "doc_id").agg(F.count("*").alias("__k"))
    nd = F.count("*").over(Window.partitionBy("__h"))
    return (
        per.select("doc_id", "__k", nd.alias("__nd"))
        .groupBy("doc_id")
        .agg(
            F.sum("__k").alias("n_spans"),
            F.coalesce(
                F.sum(F.when(F.col("__nd") >= 2, F.col("__k"))), F.lit(0)
            ).alias("n_dup_spans"),
            stable_round(
                F.coalesce(
                    F.sum(F.when(F.col("__nd") >= 2, F.col("__k"))), F.lit(0)
                ).cast("double")
                / F.sum("__k"),
                4,
            ).alias("dup_ratio"),
        )
    )


@query(
    "q_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_offset,
           CAST(floor((sum(n_tokens) OVER w - n_tokens) / 4096.0) AS INT) AS seq_idx
    FROM t
    WINDOW w AS (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing (concat-and-chunk): within each
    source shard, documents are concatenated in deterministic doc_id
    order and cut into 4096-token training sequences; each doc reports
    its stream offset and the sequence index its first token lands in.
    Partitioning by shard keeps the running sum parallel — the global
    single-reducer cumsum this replaces is the anti-pattern at 100 TB
    (one window partition = one task)."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_tok = F.size(tokens_col(F.col("text"))).cast("bigint")
    t = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / 4096.0).cast("int").alias("seq_idx"),
    )


@query(
    "q_embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, label, e,
             NULLIF(list_max(list_transform(e, x -> abs(x))) / 127.0, 0.0)
               AS scale
      FROM v
    )
    SELECT vec_id, label,
           round(scale + 1e-9, 6) AS scale_q,
           array_to_string(
             list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INT)), ','
           ) AS codes_csv,
           round(sqrt(list_sum(list_transform(
               e, x -> pow(x - scale * floor(x / scale + 0.5), 2)
             ))) + 1e-9, 4) AS l2_err
    FROM s
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the embedding-STORAGE
    scale play: scale = max|x|/127, code = floor(x/scale + 0.5), plus the
    L2 reconstruction error. At 100 TB this cuts a float32 embedding
    column 4× (and the downstream ANN shuffle volume with it) for a
    bounded, per-vector-measured recall cost. floor(x+0.5) is used in
    BOTH engines instead of round() because Spark rounds half-up while
    DuckDB rounds half-even — floor is the portable spelling. Pure
    higher-order functions: one scan, zero shuffles, codes are exact
    integers (hash-stable); only scale and error are rounded floats."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # NULLIF guards the all-zero vector: scale = 0 would make x/scale
    # abort under ANSI mode; a zero vector quantizes to NULL codes/err.
    ef = e.withColumn(
        "__scale",
        F.nullif(
            F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0),
            F.lit(0.0),
        ),
    )
    sc = F.col("__scale")
    codes = F.transform(v, lambda x: F.floor(x / sc + F.lit(0.5)).cast("int"))
    err_sq = F.aggregate(
        F.transform(v, lambda x: F.pow(x - sc * F.floor(x / sc + F.lit(0.5)), F.lit(2.0))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return ef.select(
        "vec_id",
        "label",
        stable_round(sc, 6).alias("scale_q"),
        # codes emitted CSV-joined: exact ints, and a flat string hashes
        # identically across engines (array cells don't).
        F.array_join(codes, ",").alias("codes_csv"),
        stable_round(F.sqrt(err_sq), 4).alias("l2_err"),
    )


@query(
    "q_mixture_sample",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT min(cnt) AS min_cnt FROM c)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
          < CAST(floor(65536.0 * m.min_cnt / c.cnt) AS INTEGER)
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture rebalancing: downsample every language to
    the size of the SMALLEST language (uniform target mixture) by
    content-hash thresholding — the curriculum/mixture primitive of a
    training-data pipeline (e.g. rebalance 90%-en crawl to a uniform
    lang mix). Per-lang keep-rate = min_count/count, applied as
    md5-bucket < floor(rate*65536): the same rows survive on any engine,
    partitioning, or run (unlike seeded ``sampleBy``,
    q_stratified_sample). The |langs|-row rate table broadcasts; the
    corpus scan keeps its partitioning — no shuffle of the big side, so
    the plan is scan + broadcast-probe at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    m = c.agg(F.min("cnt").alias("min_cnt"))
    rates = c.crossJoin(F.broadcast(m)).select(
        "lang",
        F.floor(F.lit(65536.0) * F.col("min_cnt") / F.col("cnt"))
        .cast("int")
        .alias("thr"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("thr"))
        .select("doc_id", "lang", "source")
    )


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, md5(array_to_string({_TOKS_SQL}, ' ')) AS fprint
      FROM documents
    ), old AS (
      SELECT DISTINCT fprint FROM fp WHERE doc_id % 10 < 7
    ), batch AS (
      SELECT doc_id, fprint FROM fp WHERE doc_id % 10 >= 7
    ), ranked AS (
      SELECT doc_id, fprint,
             row_number() OVER (PARTITION BY fprint ORDER BY doc_id) AS rn
      FROM batch
    )
    SELECT r.doc_id, r.fprint
    FROM ranked r LEFT JOIN old o ON r.fprint = o.fprint
    WHERE r.rn = 1 AND o.fprint IS NULL
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion with dedup against HISTORY — the
    shape a continuously-fed training corpus actually needs: the
    fingerprints of everything already admitted live in a persisted
    index (a transactional commit-log table), a new batch dedups
    within itself (lowest doc_id survives) and then anti-joins the
    index, and the admitted fingerprints are APPENDED back so the next
    batch sees them. Per-batch cost is O(batch + |index|) — the corpus
    itself is never rescanned, unlike q_dedup_exact's full-table pass.

    The anti-join reads the index PINNED AT VERSION 0 (time travel),
    which is what makes this replayable: the later index append cannot
    change what this batch's admission decision was — the
    reproducibility contract an audited data pipeline needs, and the
    reason the oracle (a declarative replay of the same decision) stays
    valid across invocations. At 100 TB the index is |corpus| rows of
    32-char keys — a fraction of a percent of the corpus — and the
    anti-join shuffles batch + index on the fingerprint, never the
    document bodies."""
    from nyc_taxi_etl_pyspark_spark.sources.paths import fixture_scratch_dir
    from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", fingerprint_md5(F.col("text")).alias("fprint")
    )
    is_old = F.pmod(F.col("doc_id"), F.lit(10)) < 7
    w = Window.partitionBy("fprint").orderBy("doc_id")

    def survivors(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    root = fixture_scratch_dir(
        "spark_graft_fpindex", sf_dir, anchor="documents.parquet"
    )
    t = TransactionalTable(root)
    if not t.exists():
        # index rows carry (doc_id, fprint): first-seen provenance, and
        # it lets the admitted batch be read straight back out of the
        # files its append commit added (below).
        t.commit(survivors(fp.where(is_old)))
    if t.latest_version() == 0:
        index_v0 = t.read(spark, version=0)
        admitted = survivors(fp.where(~is_old)).join(
            index_v0.select("fprint"), "fprint", "left_anti"
        )
        t.commit(admitted.select("doc_id", "fprint"), mode="append")
    # the admission decision is exactly the file set version 1 ADDED —
    # return it from storage instead of re-running the fingerprint scan
    # + window + anti-join a second time (the commit already evaluated
    # that plan once while staging).
    m0, m1 = t.manifest(0), t.manifest(1)
    added = [f for f in m1["files"] if f not in set(m0["files"])]
    return spark.read.parquet(
        *[t.storage.url(f) for f in added]
    ).select("doc_id", "fprint")


@query(
    "q_streaming_corpus_dedup",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, doc_id % 3 AS b,
             md5(array_to_string({_TOKS_SQL}, ' ')) AS fprint
      FROM documents
    ), ranked AS (
      SELECT doc_id, fprint,
             row_number() OVER (PARTITION BY fprint ORDER BY b, doc_id) AS rn
      FROM fp
    )
    SELECT doc_id, fprint FROM ranked WHERE rn = 1
    """,
)
def q_streaming_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming training-data front door
    (``streaming/jobs.py::run_streaming_corpus_dedup``): bronze doc
    commits → commit-log streaming source → per-micro-batch
    fingerprint + within-batch survivors + anti-join against the
    admitted table (which doubles as the fingerprint index) → append
    the novel fingerprints. Self-idempotent under redelivery (a
    replayed batch anti-joins its own admissions to nothing — no
    replay marker needed) and batch-deterministic (the driver drains
    per commit, so admission is "first batch wins, then lowest
    doc_id"). The oracle replays that admission rule declaratively:
    rank per fingerprint by (batch, doc_id), keep rank 1. Exempt from
    the collect guard like every q_streaming_* query: the streaming
    run executes during plan construction."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
        run_streaming_corpus_dedup,
    )

    return run_streaming_corpus_dedup(
        spark, sf_dir, query_name="q_streaming_corpus_dedup"
    )


def _streaming_semdedup_oracle() -> str:
    """Declarative replay of run_streaming_semantic_dedup's admission
    rule: three unrolled batch stages (b = vec_id % 3). Per batch: a
    recursive-CTE component pass over within-batch within-cell cosine
    pairs picks the batch survivors (min-id per component, matching
    the engine's star-contraction), then a NOT-EXISTS history check
    drops survivors with a ≥0.3 same-cell neighbor among the union of
    earlier admissions. The md5-anchor cell derivation is shared with
    q_dedup_semantic's oracle."""
    head = """
    WITH RECURSIVE anchors AS (
      SELECT list(r ORDER BY c) AS a FROM (
        SELECT c,
               [list_reduce(list_transform(
                    [substr(md5('cell|' || c || '|' || i), j, 1)
                     for j in generate_series(1, 8)],
                  ch -> CAST(position(ch IN '0123456789abcdef') AS BIGINT) - 1),
                  (x, y) -> x * 16 + y) / 2147483648.0 - 1
                for i in generate_series(1, 64)] AS r
        FROM (SELECT unnest(generate_series(0, 7)) AS c))
    ),
    e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             vec_id % 3 AS b
      FROM embeddings
    ),
    cells AS (
      SELECT vec_id, label, v, b,
             list_position(dists, list_min(dists)) - 1 AS cell
      FROM (
        SELECT vec_id, label, v, b,
               list_transform(an.a, r ->
                 list_reduce(list_transform(generate_series(1, 64),
                     i -> (v[i] - r[i]) * (v[i] - r[i])),
                   (x, y) -> x + y)) AS dists
        FROM e, anchors an)
    )"""
    stage = """,
    pairs{b} AS (
      SELECT p.vec_id AS id_a, q.vec_id AS id_b
      FROM cells p JOIN cells q
        ON p.cell = q.cell AND p.vec_id < q.vec_id
      WHERE p.b = {b} AND q.b = {b}
        AND round(list_cosine_similarity(p.v, q.v) + 1e-9, 4) >= 0.3
    ),
    edges{b} AS (
      SELECT id_a AS src, id_b AS dst FROM pairs{b}
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs{b}
    ),
    reach{b}(node, lbl) AS (
      SELECT DISTINCT src, src FROM edges{b}
      UNION
      SELECT g.dst, r.lbl FROM reach{b} r JOIN edges{b} g ON g.src = r.node
    ),
    comp{b} AS (
      SELECT node, min(lbl) AS component FROM reach{b} GROUP BY node
    ),
    surv{b} AS (
      SELECT c.vec_id, c.label, c.cell, c.v
      FROM cells c LEFT JOIN comp{b} ON c.vec_id = comp{b}.node
      WHERE c.b = {b}
        AND (comp{b}.component IS NULL OR comp{b}.component = c.vec_id)
    ),
    adm{b} AS (
      SELECT s.* FROM surv{b} s
      WHERE NOT EXISTS (
        SELECT 1 FROM ({prior}) a
        WHERE a.cell = s.cell
          AND round(list_cosine_similarity(a.v, s.v) + 1e-9, 4) >= 0.3
      )
    )"""
    priors = {
        0: "SELECT * FROM surv0 WHERE 1=0",  # no history for batch 0
        1: "SELECT * FROM adm0",
        2: "SELECT * FROM adm0 UNION ALL SELECT * FROM adm1",
    }
    body = head + "".join(
        stage.format(b=b, prior=priors[b]) for b in range(3)
    )
    return body + """
    SELECT vec_id, label, cell FROM adm0
    UNION ALL SELECT vec_id, label, cell FROM adm1
    UNION ALL SELECT vec_id, label, cell FROM adm2
    """


@query("q_streaming_semantic_dedup", oracle=_streaming_semdedup_oracle())
def q_streaming_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SemDeDup end-to-end (round 13 — the embedding-space
    complement to q_streaming_corpus_dedup): bronze vector commits →
    commit-log streaming source → per-micro-batch cell assignment +
    within-batch component survivors + same-cell cosine history check
    against the admitted table (which doubles as the cell-keyed vector
    index) → append the novel vectors. Self-idempotent under
    redelivery (a replayed vector meets itself at cosine 1.0);
    batch-deterministic (driver drains per commit), so the DuckDB
    oracle replays the whole admission history declaratively — three
    unrolled batch stages, each a recursive-CTE component pass plus a
    NOT-EXISTS check against earlier admissions. Exempt from the
    collect guard like every q_streaming_* query: the streaming run
    executes during plan construction."""
    from nyc_taxi_etl_pyspark_spark.streaming.jobs import (
        run_streaming_semantic_dedup,
    )

    return run_streaming_semantic_dedup(
        spark, sf_dir, query_name="q_streaming_semantic_dedup"
    )


@query(
    "q_bm25_score",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, toks, len(toks) AS dl
      FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    ), g AS (
      SELECT count(*) AS n, sum(dl) AS sum_dl FROM d
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, dl, unnest(toks) AS t FROM d)
      WHERE t IN ('merge', 'window', 'vector')
      GROUP BY 1, 2
    ), dft AS (
      SELECT t, count(*) AS df FROM tf GROUP BY 1
    ), j AS (
      SELECT tf.doc_id, tf.t,
             ln((g.n - dft.df + 0.5) / (dft.df + 0.5) + 1)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl
                               / (CAST(g.sum_dl AS DOUBLE) / g.n))) AS c
      FROM tf JOIN dft USING (t) CROSS JOIN g
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_terms,
           round(coalesce(sum(CASE WHEN t = 'merge' THEN c END), 0)
               + coalesce(sum(CASE WHEN t = 'window' THEN c END), 0)
               + coalesce(sum(CASE WHEN t = 'vector' THEN c END), 0)
               + 1e-9, 4) AS bm25
    FROM j GROUP BY doc_id
    """,
)
def q_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance scoring of the corpus against a fixed query
    (terms: merge, window, vector; k1=1.2, b=0.75) — the
    retrieval-standard upgrade of q_tfidf_top_terms' TF-IDF, with
    per-document length normalization and saturating term frequency.
    Plan shape at 100 TB: documents explode to (doc, query-term) hits
    FILTERED to the |Q| query terms before any shuffle (token volume
    drops to matches only), the |Q|-bounded df table and the 1-row
    (N, sum_dl) corpus stats BROADCAST back, and the big side shuffles
    once on doc_id for the final per-doc sum. Determinism: avgdl is
    computed as exact-integer sum(dl)/N (never a float avg whose
    partial-agg order drifts), and the <=|Q| per-doc contributions are
    added in FIXED literal term order via conditional sums, not a
    float sum over nondeterministically-ordered rows — both engines
    evaluate the identical expression tree, so the 4-decimal hash
    holds."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens_col(F.col("text")).alias("__toks"))
        .select("doc_id", "__toks", F.size("__toks").alias("__dl"))
    )
    terms = ["merge", "window", "vector"]
    stats = d.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__sum_dl")
    )
    tf = (
        d.select("doc_id", "__dl", F.explode("__toks").alias("__t"))
        .where(F.col("__t").isin(terms))
        .groupBy("doc_id", "__t")
        .agg(F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl"))
    )
    dft = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    avgdl = F.col("__sum_dl").cast("double") / F.col("__n")
    contrib = (
        F.log((F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1)
        * F.col("__tf")
        * 2.2
        / (F.col("__tf") + 1.2 * (0.25 + 0.75 * F.col("__dl") / avgdl))
    )
    j = (
        tf.join(F.broadcast(dft), "__t")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "__t", contrib.alias("__c"))
    )
    term_sum = [
        F.coalesce(
            F.sum(F.when(F.col("__t") == t, F.col("__c"))), F.lit(0.0)
        )
        for t in terms
    ]
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        stable_round(term_sum[0] + term_sum[1] + term_sum[2], 4).alias("bm25"),
    )


@query(
    "q_curriculum_buckets",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             round(len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE
                   + 1e-9, 4) AS quality_score
      FROM (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents)
    )
    SELECT doc_id, lang, quality_score,
           CAST(ntile(4) OVER (PARTITION BY lang
                               ORDER BY quality_score, doc_id) AS INT)
             AS curriculum_stage
    FROM scored
    """,
)
def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning stage assignment: documents are scored by a
    quality proxy (unique-token ratio — boilerplate repeats tokens,
    clean prose doesn't) and split into 4 equal-size stages by score
    QUANTILE (`ntile`) WITHIN EACH LANGUAGE stratum, lowest-quality
    stage first — the data-ordering step of curriculum training, where
    the mixture scheduler feeds stages in sequence, stratified so no
    language's "easy" data is exhausted by another's distribution.
    Determinism: the score is quantized to 4 decimals BEFORE ranking
    and doc_id breaks ties, so the ntile boundary cannot flip on a
    float ulp; ntile itself is a total-order function of the (score,
    doc_id) sort. The window partitions on lang (one shuffle, parallel
    across strata); at 100 TB a stratum can still be one reducer's
    worth, and the same assignment then runs as approx-quantile cut
    points broadcast against the scan (the q_winsorize/equidepth
    pattern) — the ntile spelling is the oracle-checkable exact
    tier."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens_col(F.col("text")).alias("__toks")
    )
    score = stable_round(
        F.size(F.array_distinct("__toks")).cast("double")
        / F.size("__toks").cast("double"),
        4,
    )
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    return (
        d.select("doc_id", "lang", score.alias("quality_score"))
        .select(
            "doc_id",
            "lang",
            "quality_score",
            F.ntile(4).over(w).cast("int").alias("curriculum_stage"),
        )
    )


@query(
    "q_pii_scan",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || doc_id || '@example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' from 10.0.' || (doc_id % 256) || '.1'
                     ELSE '' END AS txt
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+'))
             AS INT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+'))
             AS INT) AS n_ips,
           regexp_replace(
             regexp_replace(txt, '[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+', '<email>', 'g'),
             '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<ip>', 'g') AS scrubbed
    FROM aug
    """,
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (the pre-training privacy scrub): count
    and mask email addresses and dotted-quad addresses per document.
    The fixture text carries no organic PII, so the query INJECTS a
    deterministic synthetic tail (every 7th doc an email, every 11th an
    address — derived from doc_id identically in both engines) and then
    detects what it injected: the oracle proves the regex classes, the
    per-class counts, and the two-pass masking (emails first, so a
    masked address can never damage an email match) agree with an
    independent regex engine (Java util.regex vs RE2) on identical
    input — the dialect-parity check that matters before trusting a
    scrub pass at 100 TB. Patterns deliberately use the
    dialect-neutral subset (char classes + quantifiers, no lookaround,
    no word boundaries). Pure per-row Catalyst regexes: pushable,
    codegen'd, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    email_re = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
    ip_re = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    txt = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1"),
            ),
        ).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        F.regexp_count(txt, F.lit(email_re)).cast("int").alias("n_emails"),
        F.regexp_count(txt, F.lit(ip_re)).cast("int").alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace(txt, email_re, "<email>"), ip_re, "<ip>"
        ).alias("scrubbed"),
    )


@query("q_bpe_train", oracle=None)  # iterative argmax loop => rows-only
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge TRAINING (Sennrich et al. 2016, ``operators/bpe.py``)
    — the full iterative algorithm, not just one pair-frequency round
    (that single round is q_bpe_pair_freq): learn 10 merges from the
    corpus. Rows-only by necessity — each iteration's argmax feeds the
    next iteration's rewrite, which no single SQL statement expresses —
    but the check is STRONGER than an oracle: the learned merge table
    is asserted EQUAL, step by step, to a pure-Python reference
    implementation of the algorithm in
    tests/test_corpus_pipeline.py::test_bpe_train_matches_reference.
    Scale shape: the corpus collapses once to |vocab| (word, count)
    rows; every merge iteration is a small job over that table plus a
    1-row bounded argmax collect — n_merges cost is independent of
    corpus size."""
    from nyc_taxi_etl_pyspark_spark.operators.bpe import (
        bpe_merges_df,
        train_bpe,
    )

    d = load_table(spark, sf_dir, "documents")
    return bpe_merges_df(spark, train_bpe(d, "text", n_merges=10))


@query("q_bpe_fertility", oracle=None)  # depends on learned merges => rows-only
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer EVALUATION (``operators/bpe.py::apply_bpe``): train
    10 merges on the corpus, tokenize every document with them (chained
    codegen'd lookaround rewrites, zero shuffle, no Python in the row
    path), and report per-language fertility — BPE tokens per
    whitespace word, the metric multilingual tokenizer audits threshold
    (high fertility = the learned vocab fits that language poorly).
    Rows-only because the merge table feeds the tokenization (no single
    SQL statement); the inference itself is asserted word-by-word equal
    to a pure-Python reference in tests/test_corpus_pipeline.py."""
    from nyc_taxi_etl_pyspark_spark.operators.bpe import apply_bpe, train_bpe

    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe(d, "text", n_merges=10)
    out = apply_bpe(d.select("doc_id", "lang", "text"), "text", merges)
    return out.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.sum("n_words").alias("n_words"),
        stable_round(
            F.sum("n_bpe_tokens").cast("double") / F.sum("n_words"), 4
        ).alias("fertility"),
    )
