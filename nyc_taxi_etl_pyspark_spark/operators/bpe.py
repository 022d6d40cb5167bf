"""Byte-pair-encoding merge training (Sennrich et al. 2016) —
driver-orchestrated iteration over a VOCABULARY-bounded table.

The scale shape that makes BPE feasible on a 100 TB corpus: the corpus
is collapsed ONCE to (word, count) — explode + one hash aggregate, the
only data-scale operation — and every merge iteration then runs on the
|vocab|-row word table: adjacent-pair counts weighted by word count
(per-row HOF + small aggregate), a 1-row argmax collected to the driver
(bounded by construction), and the merge applied as a per-row string
rewrite. n_merges iterations cost n_merges small jobs, independent of
corpus size. Tie-breaks are total: (count DESC, left, right) — so the
learned merge sequence is deterministic on any partitioning, which the
pure-Python reference equality test (tests/test_corpus_pipeline.py)
pins exactly.

Symbols ride as a single space-delimited string per word (the classic
representation): applying merge (a, b) rewrites non-overlapping
left-to-right occurrences via lookaround-delimited regexp_replace —
identical semantics to the reference implementation's list scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_END = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, count): the ONE data-scale aggregation."""
    from nyc_taxi_etl_pyspark_spark.functions.text import tokens_col

    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """'abc' -> 'a b c </w>' (space-delimited character symbols with the
    end-of-word sentinel, so merges cannot cross word boundaries)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )
    return F.concat_ws(" ", F.concat(chars, F.array(F.lit(_END))))


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table [{step, left, right, merged, freq}] in learned order. Each
    iteration: count adjacent symbol pairs weighted by word frequency,
    pick the (count DESC, left, right) argmax, rewrite the vocab."""
    spark = df.sparkSession
    # Materialize the initial vocab ONCE (round 12, the pagerank /
    # connected-components discipline): every merge step's argmax
    # collect would otherwise re-execute the corpus tokenize + groupBy
    # from scratch — step k re-pays the corpus scan k times over.
    # After this, every step is bounded by |vocab|, independent of
    # corpus size.
    vocab = (
        word_counts(df, text_col)
        .select(_initial_symbols(F.col("word")).alias("syms"), "count")
        .localCheckpoint(eager=True)
    )
    merges: list[dict] = []
    for step in range(n_merges):
        toks = F.split(F.col("syms"), " ")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("left"),
                F.element_at(toks, i + 1).alias("right"),
            ),
        )
        best = (
            vocab.select(F.explode(pairs).alias("p"), "count")
            .groupBy("p.left", "p.right")
            .agg(F.sum("count").alias("freq"))
            .orderBy(F.desc("freq"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        left, right, freq = row["left"], row["right"], int(row["freq"])
        merged = left + right
        merges.append(
            {
                "step": step,
                "left": left,
                "right": right,
                "merged": merged,
                "freq": freq,
            }
        )
        # non-overlapping left-to-right rewrite; lookarounds keep the
        # delimiters unconsumed so adjacent occurrences all match
        pat = f"(?<=^|\\s){re.escape(left)} {re.escape(right)}(?=\\s|$)"
        # replacement is literal: escape the two chars Java treats
        # specially in replacement strings
        repl = merged.replace("\\", "\\\\").replace("$", "\\$")
        vocab = vocab.select(
            F.regexp_replace(F.col("syms"), pat, repl).alias("syms"),
            "count",
        )
        # lineage grows by one regexp projection per merge and each
        # step's collect replays the stack from the last checkpoint —
        # truncate every 10 merges so total regexp work stays O(merges
        # · |vocab|), not O(merges² · |vocab|). Lazy: the next step's
        # aggregate materializes it.
        if (step + 1) % 10 == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def bpe_merges_df(
    spark: SparkSession, merges: list[dict]
) -> DataFrame:
    """Merge list → DataFrame (step, left, right, merged, freq)."""
    if not merges:
        return spark.createDataFrame(
            [], "step int, left string, right string, merged string, freq bigint"
        )
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["merged"], m["freq"]) for m in merges],
        "step int, left string, right string, merged string, freq bigint",
    )


def reference_bpe(word_count_pairs: list[tuple[str, int]], n_merges: int) -> list[dict]:
    """Pure-Python reference implementation (list-scan rewrite, same
    tie-break) — the equality oracle for train_bpe in tests."""
    vocab = {}
    for w, c in word_count_pairs:
        syms = tuple(list(w) + [_END])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[dict] = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        merges.append(
            {"step": step, "left": left, "right": right, "merged": merged, "freq": freq}
        )
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def apply_bpe(
    df: DataFrame, text_col: str, merges: list[dict]
) -> DataFrame:
    """Tokenize with a learned merge table: per word, start from
    character symbols and apply every merge IN LEARNED ORDER (the BPE
    inference rule) as a chained lookaround rewrite — |merges| chained
    regexp columns, all codegen'd, zero shuffle, no Python in the row
    path. Returns one row per input row: the BPE token sequence plus
    the fertility signals a tokenizer evaluation reports (BPE tokens
    per whitespace word — high fertility = the vocab fits the text
    poorly, the metric multilingual tokenizer audits threshold)."""
    from nyc_taxi_etl_pyspark_spark.functions.text import tokens_col

    words = tokens_col(F.col(text_col))
    syms = F.concat_ws(
        "  ", F.transform(words, lambda w: _initial_symbols(w))
    )  # double space between words: no cross-word pair can form
    for m in merges:
        pat = f"(?<=^|\\s){re.escape(m['left'])} {re.escape(m['right'])}(?=\\s|$)"
        repl = m["merged"].replace("\\", "\\\\").replace("$", "\\$")
        syms = F.regexp_replace(syms, pat, repl)
    toks = F.filter(F.split(syms, " +"), lambda t: t != "")
    return df.select(
        "*",
        toks.alias("bpe_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(words).alias("n_words"),
        F.round(
            F.size(toks).cast("double")
            / F.nullif(F.size(words).cast("double"), F.lit(0.0)),
            4,
        ).alias("fertility"),
    )


def reference_apply_bpe(word: str, merges: list[dict]) -> list[str]:
    """Pure-Python BPE inference on one word (same order, same
    left-to-right non-overlap) — the equality oracle for apply_bpe."""
    syms = list(word) + [_END]
    for m in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == m["left"]
                and syms[i + 1] == m["right"]
            ):
                out.append(m["merged"])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
