"""Property-based tests (hypothesis): the scale-correct join
formulations must agree with brute-force reference semantics on
arbitrary small inputs — edge cases a fixture can't enumerate (ties,
empty keys, boundary timestamps, duplicate rows).

Spark jobs per example are expensive, so examples are kept few and wide
(deadline disabled; each example is a full Spark plan execution)."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)

BASE = 1_700_000_000  # arbitrary epoch anchor


def _ts(s: int) -> datetime:
    return datetime.fromtimestamp(BASE + s, tz=timezone.utc).replace(tzinfo=None)


row = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=600),  # ts offset seconds
    st.integers(min_value=-5, max_value=5),  # value
)

rows = st.lists(row, min_size=0, max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=rows, right_rows=rows)
def test_asof_join_matches_naive(spark, left_rows, right_rows):
    # the operator leaves ties on equal (key, right_ts) unordered (real
    # feeds carry a unique sequence column); keep one row per (key, ts)
    seen: set[tuple[int, int]] = set()
    right_rows = [
        r for r in right_rows if not (r[:2] in seen or seen.add(r[:2]))
    ]
    left = spark.createDataFrame(
        [(k, _ts(t), v, i) for i, (k, t, v) in enumerate(left_rows)],
        schema="key int, ts timestamp, lval int, lid int",
    )
    right = spark.createDataFrame(
        [(k, _ts(t), v) for (k, t, v) in right_rows],
        schema="key int, rts timestamp, rval int",
    )
    got = {
        (r["lid"], r["rval_asof"])
        for r in asof_join(
            left,
            right,
            key_cols=["key"],
            left_ts="ts",
            right_ts="rts",
            value_cols=["rval"],
        ).collect()
    }
    # naive: for each left row, the rval of the max right ts <= left ts;
    # ties on rts resolved identically by taking the LAST in (ts, insertion)
    # order — mirror the operator's window order exactly
    want = set()
    for i, (k, t, _v) in enumerate(left_rows):
        candidates = [
            (rt, j, rv)
            for j, (rk, rt, rv) in enumerate(right_rows)
            if rk == k and rt <= t
        ]
        want.add((i, max(candidates)[2] if candidates else None))
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=rows,
    right_rows=rows,
    lower=st.integers(min_value=-120, max_value=120),
    width=st.integers(min_value=1, max_value=300),
)
def test_range_join_matches_naive(spark, left_rows, right_rows, lower, width):
    upper = lower + width
    left = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t, _v) in enumerate(left_rows)],
        schema="key int, lts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(k, _ts(t), j) for j, (k, t, _v) in enumerate(right_rows)],
        schema="key int, rts timestamp, rid int",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join_bucketed(
            left,
            right,
            key_cols=["key"],
            left_ts="lts",
            right_ts="rts",
            lower_s=lower,
            upper_s=upper,
        ).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt, _lv) in enumerate(left_rows)
        for j, (rk, rt, _rv) in enumerate(right_rows)
        if lk == rk and lt + lower <= rt <= lt + upper
    }
    assert got == want


def test_minhash_identical_docs_always_pair(spark):
    """Identical texts have identical signatures ⇒ every band collides:
    the pair MUST surface with n_shared_buckets == bands. A distinct doc
    with no shared shingles must not pair with them."""
    from nyc_taxi_etl_pyspark_spark.operators.dedup import minhash_lsh_dedup

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated words about spark planning engines"),
        ],
        schema="doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared_buckets"]
        for r in minhash_lsh_dedup(
            df, id_col="doc_id", text_col="text", num_hashes=32, bands=8,
            shingle_n=2,
        ).collect()
    }
    assert pairs.get((1, 2)) == 8
    assert all(k == (1, 2) for k in pairs)


def test_dedup_exact_survivor_is_deterministic(spark):
    from nyc_taxi_etl_pyspark_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(1, "b", 20), (1, "a", 10), (2, "c", 30), (1, "a", 5)],
        schema="k long, s string, v int",
    )
    out = dedup_exact(df, keys=["k"], order_by=["s", "v"]).collect()
    got = {(r["k"], r["s"], r["v"]) for r in out}
    assert got == {(1, "a", 5), (2, "c", 30)}


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcdefg", min_size=1, max_size=5),
            min_size=1,
            max_size=90,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_chunker_covers_and_reconstructs(spark, docs):
    """Chunker invariants on arbitrary token lists: (a) stride-slices of
    the chunks concatenate back to the exact document, (b) every chunk is
    ≤ CHUNK_SIZE tokens, (c) consecutive chunks overlap by exactly
    CHUNK_OVERLAP tokens (when long enough)."""
    from nyc_taxi_etl_pyspark_spark.functions.udtf import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        chunk_documents,
    )

    stride = CHUNK_SIZE - CHUNK_OVERLAP
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    out = chunk_documents(spark, df).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # (a) reconstruct: first `stride` tokens of each chunk + tail of last
        rebuilt: list[str] = []
        for c in chunks[:-1]:
            rebuilt.extend(c["chunk_text"].split(" ")[:stride])
        rebuilt.extend(chunks[-1]["chunk_text"].split(" "))
        assert rebuilt == toks
        for a, b in zip(chunks, chunks[1:]):
            assert a["n_chunk_tokens"] <= CHUNK_SIZE
            if a["n_chunk_tokens"] == CHUNK_SIZE:
                # (c) the next chunk re-reads the last CHUNK_OVERLAP tokens
                assert (
                    a["chunk_text"].split(" ")[stride:]
                    == b["chunk_text"].split(" ")[: CHUNK_OVERLAP]
                )


def test_merge_upsert_schema_mismatch_raises(spark):
    import pytest as _pytest

    from nyc_taxi_etl_pyspark_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    upd = spark.createDataFrame([(1, "a", 2)], ["k", "v", "extra"])
    with _pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(base, upd, key_cols=["k"])


def test_merge_upsert_semantics(spark):
    """Updates win, inserts appear, untouched base rows pass through —
    and an update may legitimately set a value column to NULL."""
    from nyc_taxi_etl_pyspark_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    upd = spark.createDataFrame([(2, "B"), (4, "D"), (5, None)], ["k", "v"])
    out = {r["k"]: r["v"] for r in merge_upsert(base, upd, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D", 5: None}


def test_sequence_packing_invariants(spark, sf_dir):
    """Offsets are contiguous within each shard (offset = previous offset
    + previous n_tokens under doc_id order) and seq_idx == offset//4096."""
    from collections import defaultdict

    from nyc_taxi_etl_pyspark_spark.plans.registry import all_queries

    rows = all_queries()["q_sequence_packing"](spark, sf_dir).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in docs:
            assert r["start_offset"] == expect, (src, r)
            assert r["seq_idx"] == r["start_offset"] // 4096
            expect += r["n_tokens"]


def test_contamination_flags_benchmark_overlap_only(spark, sf_dir):
    """No flagged doc comes from the benchmark source, and every flagged
    doc really shares >=1 3-gram with it (ratio in (0, 1])."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_pyspark_spark.plans.registry import all_queries
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

    flagged = all_queries()["q_contamination_ngram"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = flagged.join(docs, "doc_id").select("doc_id", "source", "contamination_ratio")
    rows = joined.collect()
    assert rows, "expected at least one contaminated doc in the fixture"
    for r in rows:
        assert r["source"] != "src0"
        assert 0.0 < r["contamination_ratio"] <= 1.0


def test_minhash_oph_identical_docs_always_pair(spark):
    """OPH scheme invariants: identical texts yield identical densified
    signatures (all bands collide, even for docs with far fewer distinct
    shingles than signature slots — the densification path), and a
    disjoint-shingle doc never pairs with them."""
    from nyc_taxi_etl_pyspark_spark.operators.dedup import (
        minhash_lsh_dedup,
        minhash_signatures_oph,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated words about spark planning engines"),
        ],
        schema="doc_id long, text string",
    )
    sigs = {
        r["doc_id"]: tuple(r["minhash_sig"])
        for r in minhash_signatures_oph(
            df, "doc_id", "text", num_hashes=32, shingle_n=2
        ).collect()
    }
    assert sigs[1] == sigs[2] != sigs[3]
    # 8 distinct 2-shingles < 32 slots: densification must fill every slot
    assert all(v is not None for v in sigs[1])
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared_buckets"]
        for r in minhash_lsh_dedup(
            df, id_col="doc_id", text_col="text", num_hashes=32, bands=8,
            shingle_n=2, scheme="oph",
        ).collect()
    }
    assert pairs.get((1, 2)) == 8
    assert all(k == (1, 2) for k in pairs)


def test_snb_blocking_lossless_on_second_key(spark, sf_dir):
    """Zero window-loss for sorted-neighborhood blocking on a SECOND,
    independent fixture key (acctbal band, negative values included):
    the bucket ±1 equi-join must produce EXACTLY the pairs of the
    unblocked banded theta-join for multiple window widths — proving
    the scheme's losslessness is a property of the banding, not of the
    name-tail key q_record_linkage_snb happens to use."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_pyspark_spark.operators.joins import (
        sorted_neighborhood_candidates,
    )
    from nyc_taxi_etl_pyspark_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.floor("c_acctbal").cast("long").alias("ck")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.floor("s_acctbal").cast("long").alias("sk")
    )
    assert cust.where(F.col("ck") < 0).count() > 0  # negatives exercised
    for w in (7, 50):
        got = sorted(
            map(
                tuple,
                sorted_neighborhood_candidates(cust, supp, "ck", "sk", w)
                .select("c_custkey", "s_suppkey")
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                cust.join(supp, F.abs(F.col("ck") - F.col("sk")) <= w)
                .select("c_custkey", "s_suppkey")
                .collect(),
            )
        )
        assert got == want and len(got) > 0, f"window {w}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lkeys=st.lists(st.integers(-40, 40), min_size=0, max_size=15),
    rkeys=st.lists(st.integers(-40, 40), min_size=0, max_size=15),
    window=st.integers(1, 9),
)
def test_snb_candidates_property_lossless(spark, lkeys, rkeys, window):
    """Property form of the sorted-neighborhood losslessness proof:
    for ARBITRARY key multisets (negatives, duplicates, empties) and
    window widths, the bucket ±1 equi-join produces exactly the pairs
    of the banded theta-join — the guarantee is the banding algebra,
    not any fixture's key distribution."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_pyspark_spark.operators.joins import (
        sorted_neighborhood_candidates,
    )

    left = spark.createDataFrame(
        [(i, k) for i, k in enumerate(lkeys)] or [(0, None)], "lid int, lk long"
    ).where(F.col("lk").isNotNull())
    right = spark.createDataFrame(
        [(i, k) for i, k in enumerate(rkeys)] or [(0, None)], "rid int, rk long"
    ).where(F.col("rk").isNotNull())
    got = sorted(
        (r["lid"], r["rid"])
        for r in sorted_neighborhood_candidates(
            left, right, "lk", "rk", window
        ).collect()
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in left.join(
            right, F.abs(F.col("lk") - F.col("rk")) <= window
        ).collect()
    )
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lvals=st.lists(
        st.one_of(
            st.none(),
            st.floats(-50, 50, allow_nan=False).map(lambda x: round(x, 2)),
        ),
        min_size=0,
        max_size=20,
    ),
    rvals=st.lists(
        st.one_of(
            st.none(),
            st.floats(-50, 50, allow_nan=False).map(lambda x: round(x, 2)),
        ),
        min_size=0,
        max_size=12,
    ),
    band_width=st.sampled_from([0.5, 1.0, 7.0]),
)
def test_theta_lt_count_banded_property(spark, lvals, rvals, band_width):
    """The round-14 counting-sort replacement for the keyless theta
    aggregate must equal the nested-loop ground truth for ARBITRARY
    value multisets — negatives, NULLs on either side, exact ties
    (strictly-less must exclude them), duplicate right rows (each
    counts its own matches), zero-match rows (count 0, present) — and
    for several band widths, proving the banding algebra and not a
    fixture's distribution."""
    from nyc_taxi_etl_pyspark_spark.operators.joins import (
        theta_lt_count_banded,
    )

    left = spark.createDataFrame(
        [(i, v) for i, v in enumerate(lvals)] or [(0, None)],
        "lid int, lv double",
    )
    right = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rvals)] or [(0, None)],
        "rid int, rv double",
    )
    got = {
        r["rid"]: r["n_lt"]
        for r in theta_lt_count_banded(
            left,
            right,
            left_val="lv",
            right_val="rv",
            right_keys=["rid"],
            band_width=band_width,
        ).collect()
    }
    want = {
        i: sum(1 for lv in lvals if lv is not None and rv is not None and lv < rv)
        for i, rv in enumerate(rvals or [None])
    }
    assert got == want
