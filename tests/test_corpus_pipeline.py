"""End-to-end corpus pipeline composition (examples/corpus_pipeline_example):
the staged operators must compose into one consistent result — dedup
survivors are a subset with no duplicate fingerprints, every curated row
passes the quality gate, and packing offsets form a correct per-source
prefix sum."""

from __future__ import annotations

import importlib.util
import os
import sys

from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "corpus_pipeline_example",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "corpus_pipeline_example.py",
    ),
)
_mod = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("corpus_pipeline_example", _mod)
_spec.loader.exec_module(_mod)


def test_documents_doc_id_unique(spark, sf_dir):
    """doc_id uniqueness is a stated PRECONDITION of the map-side
    (doc, token) dedup in queries_text._cooccurrence_pairs (ADVICE
    r14): explode(array_distinct(...)) dedups tokens within one row
    only, so duplicate doc_id ROWS would inflate df counts relative
    to the old explode→distinct spelling."""
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert docs.count() == docs.select("doc_id").distinct().count()


def test_corpus_pipeline_invariants(spark, sf_dir):
    from nyc_taxi_etl_pyspark_spark.functions.text import (
        fingerprint_md5,
        quality_gate,
        tokens_col,
    )
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed, stats = _mod.build_curated_corpus(spark, sf_dir)
    out = packed.cache()

    # subset of the input, keyed by doc_id
    n_docs = docs.count()
    n_out = out.count()
    assert 0 < n_out <= n_docs
    assert out.join(docs, "doc_id", "left_anti").count() == 0

    # exact dedup held: one row per content fingerprint
    assert (
        out.withColumn("fp", fingerprint_md5(F.col("text")))
        .groupBy("fp")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )

    # every curated row passes the quality gate
    assert out.filter(~quality_gate(tokens_col(F.col("text")))).count() == 0

    # packing: start_offset is the per-source prefix sum over doc_id order
    rows = out.select("source", "doc_id", "n_tokens", "start_offset").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["doc_id"])
        running = 0
        for r in rs:
            assert r["start_offset"] == running, (source, r)
            running += r["n_tokens"]

    # mixture stats reconcile with the curated output
    mix = stats["mixture"]
    assert mix.agg(F.sum("n_docs")).first()[0] == n_out
    assert (
        mix.agg(F.sum("n_tokens")).first()[0]
        == out.agg(F.sum("n_tokens")).first()[0]
    )
    out.unpersist()


def test_bpe_train_matches_reference(spark, sf_dir):
    """train_bpe (driver-orchestrated Spark iteration) must learn the
    IDENTICAL merge sequence — pair, merged symbol, frequency, order —
    as the pure-Python reference on the same corpus, for every step.
    This pins the pair counting, the (freq DESC, left, right)
    tie-break, and the non-overlapping left-to-right rewrite."""
    from nyc_taxi_etl_pyspark_spark.operators.bpe import (
        reference_bpe,
        train_bpe,
        word_counts,
    )
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    got = train_bpe(d, "text", n_merges=12)
    wc = [(r["word"], r["count"]) for r in word_counts(d, "text").collect()]
    want = reference_bpe(wc, n_merges=12)
    assert got == want and len(got) == 12


def test_bpe_rewrite_handles_adjacent_and_overlapping_pairs(spark):
    """The regexp rewrite must merge non-overlapping occurrences
    left-to-right exactly like the reference list scan — including the
    'a a a' case where the first merge consumes the shared middle."""
    from nyc_taxi_etl_pyspark_spark.operators.bpe import (
        reference_bpe,
        train_bpe,
    )

    df = spark.createDataFrame(
        [("aaa aaa aa",), ("aaa aa aa",)], "text string"
    )
    got = train_bpe(df, "text", n_merges=3)
    want = reference_bpe([("aaa", 3), ("aa", 3)], n_merges=3)
    assert got == want


def test_bpe_apply_matches_reference_inference(spark, sf_dir):
    """apply_bpe's chained-regexp tokenization must produce, word by
    word, the token sequences the reference per-word inference scan
    yields under the same learned merges — and fertility must equal
    n_bpe_tokens / n_words."""
    from nyc_taxi_etl_pyspark_spark.operators.bpe import (
        apply_bpe,
        reference_apply_bpe,
        train_bpe,
    )
    from nyc_taxi_etl_pyspark_spark.functions.text import tokens_col
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe(d, "text", n_merges=8)
    out = apply_bpe(d.select("doc_id", "text"), "text", merges)
    rows = out.select("doc_id", "text", "bpe_tokens", "n_bpe_tokens", "n_words", "fertility").collect()
    assert len(rows) == 50
    for r in rows:
        words = [w for w in r["text"].lower().split() if w]
        want = [t for w in words for t in reference_apply_bpe(w, merges)]
        assert list(r["bpe_tokens"]) == want, r["doc_id"]
        assert r["n_words"] == len(words)
        assert r["n_bpe_tokens"] == len(want)
        assert abs(r["fertility"] - round(len(want) / len(words), 4)) < 1e-9
