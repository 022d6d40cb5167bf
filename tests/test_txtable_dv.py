"""Merge-on-read deletion vectors (sources/txtable.py ``_dv_delete``
and friends — no reference counterpart; the reference,
``src/pipeline/etl_writer.py``, only overwrites whole partitions).

The contract under test: ``delete_where(..., merge_on_read=True)`` and
``update_where(..., merge_on_read=True)`` mutate rows WITHOUT rewriting
any data file — the whole commit is one small ``_dvs/`` position
sidecar plus a stats delta — while every read path (current, time
travel, metadata count, change feed, maintenance rewrite) stays exactly
as precise as the copy-on-write forms. Plus the lifecycle edges:
stacked DVs, re-deletes seeing only live rows, emptied-file drops,
checkpoint/delta reconstruction of the ``dv`` stats entry, vacuum GC of
orphaned sidecars, and the streaming source failing a DV commit loudly
(it mutates rows while removing no file — the silent case).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.sources.txtable import (
    DVS_DIR,
    TransactionalTable,
)


def _tenk(spark, n=1000):
    """n rows in 4 files: id, k = id % 10, v = id * 2.0."""
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 10).alias("k"),
            (F.col("id") * 2.0).alias("v"),
        )
        .repartition(4)
    )


def _dv_sidecars(root: str) -> list[str]:
    d = os.path.join(root, DVS_DIR)
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_dv_delete_rewrites_nothing_and_reads_exact(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TransactionalTable(root)
    t.commit(_tenk(spark))
    before_files = sorted(t.manifest()["files"])

    res = t.delete_where(spark, "k = 3", merge_on_read=True)
    assert res["files_rewritten"] == 0
    assert res["rows_deleted"] == 100
    assert res["dv_files"] == 4  # every file held k=3 rows
    # the data file SET is untouched — the commit is stats + sidecar
    assert sorted(t.manifest()["files"]) == before_files
    assert len(_dv_sidecars(root)) == 1

    cur = t.read(spark)
    assert cur.count() == 900
    assert cur.where("k = 3").count() == 0
    # filtered read over non-deleted keys is untouched
    assert cur.where("k = 7").count() == 100
    # metadata-only count() agrees with the logical row count
    assert t.count() == 900
    # time travel: the pre-delete snapshot still reads every row
    assert t.read(spark, 0).count() == 1000
    assert t.count(0) == 1000


def test_dv_stacked_and_redelete_sees_only_live_rows(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark))
    t.delete_where(spark, "k = 4 AND id < 500", merge_on_read=True)
    # second DV on the SAME files: only live rows may match again
    res = t.delete_where(spark, "k = 4", merge_on_read=True)
    assert res["rows_deleted"] == 50  # the surviving k=4 half, not 100
    assert t.read(spark).count() == 900
    assert t.read(spark).where("k = 4").count() == 0
    # each version of the stack is exact under time travel
    assert t.read(spark, 1).where("k = 4").count() == 50
    # stats carry BOTH sidecar refs for the stacked files
    stats = t.manifest().get("stats", {})
    refs = {r for s in stats.values() for r in s.get("dv", {}).get("refs", [])}
    assert len(refs) == 2


def test_dv_delete_drops_fully_emptied_files(spark, tmp_path):
    """A file whose every physical row is deleted leaves the snapshot
    instead of carrying a full-file DV."""
    t = TransactionalTable(str(tmp_path / "t"))
    # partition by k → each file holds exactly one k value
    t.commit(
        spark.range(100).select(
            F.col("id"), (F.col("id") % 4).alias("k")
        ),
        partition_by=["k"],
    )
    n_before = len(t.manifest()["files"])
    res = t.delete_where(spark, "k = 2", merge_on_read=True)
    assert res["rows_deleted"] == 25
    assert res["files_dropped_empty"] >= 1
    assert len(t.manifest()["files"]) == n_before - res["files_dropped_empty"]
    assert t.read(spark).count() == 75
    assert t.read(spark).where("k = 2").count() == 0


def test_dv_delete_on_partitioned_table_keys_by_path_suffix(spark, tmp_path):
    """Two hive partitions' task-0 files share a NAME — the DV join key
    must be the table-relative path, or positions would cross-delete."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(
        spark.range(200).select(
            F.col("id"), (F.col("id") % 2).alias("p"), (F.col("id") % 5).alias("k")
        ),
        partition_by=["p"],
    )
    res = t.delete_where(spark, "k = 1 AND id < 100", merge_on_read=True)
    assert res["files_rewritten"] == 0
    assert res["rows_deleted"] == 20
    cur = t.read(spark)
    assert cur.count() == 180
    assert cur.where("k = 1 AND id < 100").count() == 0
    assert cur.where("k = 1").count() == 20  # id >= 100 half lives
    # partition-scoped reads subtract exactly their own partition's DV
    # positions (ids ≡ 1 mod 5 below 100 split 10/10 across p=0/p=1)
    assert cur.where("p = 0").count() == 90
    assert cur.where("p = 1").count() == 90


def test_dv_update_appends_new_rows_and_soft_deletes_old(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark))
    res = t.update_where(spark, {"v": "v + 1000"}, "k = 5", merge_on_read=True)
    assert res["files_rewritten"] == 0
    assert res["rows_updated"] == 100
    assert res["files_appended"] >= 1
    cur = t.read(spark)
    assert cur.count() == 1000  # cardinality unchanged
    got = cur.where("k = 5").agg(
        F.count("*").alias("c"), F.min("v").alias("mn")
    ).first()
    assert (got.c, got.mn) == (100, 5 * 2.0 + 1000)
    # untouched keys untouched; old snapshot isolated
    assert cur.where("k = 6").agg(F.max("v")).first()[0] == 996 * 2.0
    assert t.read(spark, 0).where("k = 5").agg(F.max("v")).first()[0] == 995 * 2.0
    assert t.count() == 1000


def test_dv_update_rhs_sees_old_row_and_casts_to_schema(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 100))
    before = dict(t.read(spark).dtypes)
    # RHS yields a double-typed expr for a bigint column → cast back
    t.update_where(spark, {"id": "id + 0.9"}, "k = 2", merge_on_read=True)
    cur = t.read(spark)
    assert dict(cur.dtypes) == before
    # 2 + 0.9 cast to bigint truncates (ANSI cast of 2.9 → 2)
    assert cur.where("k = 2").agg(F.min("id")).first()[0] == 2


def test_dv_update_moves_rows_across_partitions(spark, tmp_path):
    """An assignment that changes the partition column must land the
    updated rows in the RIGHT partition directory (staging re-applies
    the table layout, exactly like copy-on-write)."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(
        spark.range(100).select(F.col("id"), (F.col("id") % 4).alias("p")),
        partition_by=["p"],
    )
    res = t.update_where(spark, {"p": "5"}, "p = 1", merge_on_read=True)
    assert res["rows_updated"] == 25
    cur = t.read(spark)
    assert cur.where("p = 1").count() == 0
    assert cur.where("p = 5").count() == 25
    assert cur.count() == 100
    # partition-pruned band read resolves the moved rows
    assert t.read(spark, where=[("p", 5, 5)]).count() == 25


def test_dv_optimize_materializes_and_never_resurrects(spark, tmp_path):
    """Regression for the round-7 advice finding: optimize_incremental
    read compaction inputs with a raw reader, resurrecting soft-deleted
    rows and dropping the dv stats entry. Both OPTIMIZE forms must
    rewrite through the DV-aware reader."""
    for name, run in (
        ("full", lambda t: t.optimize(spark, target_rows_per_file=1000)),
        (
            "incr",
            lambda t: t.optimize_incremental(spark, target_rows_per_file=1000),
        ),
    ):
        t = TransactionalTable(str(tmp_path / f"t_{name}"))
        t.commit(_tenk(spark, 100))
        t.delete_where(spark, "k = 0", merge_on_read=True)
        assert t.read(spark).count() == 90
        res = run(t)
        assert t.read(spark).count() == 90, name
        assert t.read(spark).where("k = 0").count() == 0, name
        # materialized: no dv entry survives on the compacted snapshot
        stats = t.manifest().get("stats", {})
        assert not any("dv" in s for s in stats.values()), name
        if name == "incr":
            assert res["rows_compacted"] == 90  # logical, not physical


def test_dv_band_delete_logical_row_arithmetic(spark, tmp_path):
    """Copy-on-write band delete() over a DV-carrying file: rows_deleted
    must not double-count the soft-deleted rows (round-7 advice)."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 100))
    t.delete_where(spark, "k = 0", merge_on_read=True)  # 10 rows soft-dead
    res = t.delete(spark, [("k", 5, 6)])  # copy-on-write over same files
    assert res["rows_deleted"] == 20
    assert t.read(spark).count() == 70
    assert t.manifest()["rows"] == 70
    assert t.count() == 70


def test_dv_change_feed_reports_dv_deletes(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 100))
    v = t.delete_where(spark, "k = 7", merge_on_read=True)["version"]
    feed = t.changes(spark, ["id"], v - 1, v)
    rows = feed.collect()
    assert len(rows) == 10
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["id"] for r in rows) == [7, 17, 27, 37, 47, 57, 67, 77, 87, 97]


def test_dv_stats_survive_checkpoint_reconstruction(spark, tmp_path):
    """The ``dv`` stats entry must round-trip through the columnar
    checkpoint and the delta chain: a FRESH handle resolving the
    snapshot via checkpoint must subtract the same positions."""
    root = str(tmp_path / "t")
    t = TransactionalTable(root, checkpoint_interval=2)
    t.commit(_tenk(spark, 100))
    t.delete_where(spark, "k = 9", merge_on_read=True)
    # drive a few commits across checkpoint boundaries
    t.commit(
        spark.range(1000, 1010).select(
            F.col("id"), (F.col("id") % 10).alias("k"), (F.col("id") * 2.0).alias("v")
        ),
        mode="append",
    )
    t.commit(
        spark.range(1010, 1020).select(
            F.col("id"), (F.col("id") % 10).alias("k"), (F.col("id") * 2.0).alias("v")
        ),
        mode="append",
    )
    fresh = TransactionalTable(root, checkpoint_interval=2)
    cur = fresh.read(spark)
    assert cur.count() == 110
    assert cur.where("k = 9 AND id < 1000").count() == 0
    assert fresh.count() == 110
    # time travel through the checkpointed history stays exact
    assert fresh.read(spark, 1).count() == 90


def test_dv_vacuum_reclaims_orphaned_sidecars_keeps_live(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TransactionalTable(root)
    t.commit(_tenk(spark, 100))
    t.delete_where(spark, "k = 1", merge_on_read=True)
    assert len(_dv_sidecars(root)) == 1
    # live DV: vacuum must NOT touch it
    res = t.vacuum(retain_versions=1, unreferenced_grace_s=0)
    assert res["removed_dv_sidecars"] == 0
    assert len(_dv_sidecars(root)) == 1
    assert t.read(spark).count() == 90

    # full replace orphans the sidecar; dry run reports, real run deletes
    t.commit(_tenk(spark, 50), mode="replace")
    dry = t.vacuum(retain_versions=1, unreferenced_grace_s=0, dry_run=True)
    assert dry["removed_dv_sidecars"] == 1
    assert len(_dv_sidecars(root)) == 1  # dry run touched nothing
    res = t.vacuum(retain_versions=1, unreferenced_grace_s=0)
    assert res["removed_dv_sidecars"] == 1
    assert len(_dv_sidecars(root)) == 0
    assert t.read(spark).count() == 50

    # writer grace: a FRESH orphan inside the window is kept
    t2root = str(tmp_path / "t2")
    t2 = TransactionalTable(t2root)
    t2.commit(_tenk(spark, 100))
    t2.delete_where(spark, "k = 2", merge_on_read=True)
    t2.commit(_tenk(spark, 50), mode="replace")
    res = t2.vacuum(retain_versions=1, unreferenced_grace_s=3600)
    assert res["removed_dv_sidecars"] == 0
    assert len(_dv_sidecars(t2root)) == 1


def test_dv_restore_across_dv_commit(spark, tmp_path):
    """RESTORE to a pre-DV version, then forward again: every snapshot
    keeps its own logical content (dv refs ride per-version stats)."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 100))
    v_dv = t.delete_where(spark, "k = 8", merge_on_read=True)["version"]
    t.restore(0)
    assert t.read(spark).count() == 100
    assert t.count() == 100
    t.restore(v_dv)
    assert t.read(spark).count() == 90
    assert t.read(spark).where("k = 8").count() == 0


def test_txstream_fails_loudly_on_dv_commit(spark, tmp_path):
    """A DV delete removes no file — the old detector (file-set
    removal) silently passed the mutation through. The append-only
    contract must fail it exactly like a rewrite (round-7 verdict)."""
    from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    root = str(tmp_path / "t")
    t = TransactionalTable(root)
    t.commit(_tenk(spark, 100))

    s = spark.readStream.format("txstream").option("path", root).load()
    q = (
        s.writeStream.format("memory")
        .queryName("txs_dv")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("txs_dv").count() == 100
        t.delete_where(spark, "k = 0", merge_on_read=True)
        q.processAllAvailable()
        raise AssertionError("stream should have failed on the DV commit")
    except Exception as exc:  # noqa: BLE001 - StreamingQueryException wrapper
        assert "deletion vector" in str(exc) or "append-only" in str(exc)
    finally:
        q.stop()


def test_dv_noop_when_nothing_matches(spark, tmp_path):
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 100))
    v = t.latest_version()
    res = t.delete_where(spark, "k = 3 AND id > 10000", merge_on_read=True)
    assert res["rows_deleted"] == 0
    assert t.latest_version() == v  # no empty commit
    assert _dv_sidecars(str(tmp_path / "t")) == []


def test_sql_routing_hint_and_table_property(spark, tmp_path):
    """SQL front door: ``DELETE /*+ MERGE_ON_READ */`` routes through
    deletion vectors, the sticky ``merge_on_read`` table property
    routes bare statements, and ``/*+ COPY_ON_WRITE */`` overrides the
    property back (``sources/txsql.py::_merge_on_read``)."""
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml

    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark))
    tables = {"sqldv": t}

    r = execute_dml(
        spark, "DELETE /*+ MERGE_ON_READ */ FROM sqldv WHERE k = 3", tables
    )
    assert r["files_rewritten"] == 0 and r["rows_deleted"] == 100

    r = execute_dml(
        spark,
        "ALTER TABLE sqldv SET TBLPROPERTIES (merge_on_read = true)",
        tables,
    )
    assert r["properties"] == {"merge_on_read": "true"}
    r = execute_dml(spark, "DELETE FROM sqldv WHERE k = 4", tables)
    assert r["files_rewritten"] == 0 and r["rows_deleted"] == 100
    r = execute_dml(spark, "UPDATE sqldv SET v = v + 1 WHERE k = 6", tables)
    assert r["files_rewritten"] == 0 and r["rows_updated"] == 100

    # hint overrides the property back to copy-on-write
    r = execute_dml(
        spark, "DELETE /*+ COPY_ON_WRITE */ FROM sqldv WHERE k = 5", tables
    )
    assert r["files_rewritten"] > 0 and r["rows_deleted"] == 100

    # property survives maintenance commits (sticky meta) and unsets
    t.optimize(spark, target_rows_per_file=10_000)
    assert t.properties()["merge_on_read"] == "true"
    execute_dml(
        spark,
        "ALTER TABLE sqldv SET TBLPROPERTIES (merge_on_read = null)",
        tables,
    )
    r = execute_dml(spark, "DELETE FROM sqldv WHERE k = 7", tables)
    assert r["files_rewritten"] > 0
    assert t.read(spark).count() == 600
    assert t.read(spark).where("k = 6").agg(F.min("v")).first()[0] == 13.0


def test_fsck_flags_missing_dv_sidecar(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TransactionalTable(root)
    t.commit(_tenk(spark, 100))
    t.delete_where(spark, "k = 1", merge_on_read=True)
    assert t.fsck()["ok"]
    # simulate a lifecycle-policy misfire eating the sidecar
    dv = _dv_sidecars(root)[0]
    os.remove(os.path.join(root, DVS_DIR, dv))
    f = TransactionalTable(root).fsck()
    assert not f["ok"]
    assert f["missing_dv_sidecars"] == [f"{DVS_DIR}/{dv}"]


def test_insert_only_merge_does_not_duplicate_matched_targets(spark, tmp_path):
    """Round-7 advice: an insert-only clause merge with duplicate
    source keys fanned matched target rows out through the full-outer
    join. Now: target rows pass through exactly once (anti-join +
    union) while duplicate NON-matching sources all insert (the Delta
    insert-only relaxation)."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    )
    src = spark.createDataFrame(
        [(1, 91.0), (1, 92.0), (9, 90.0), (9, 95.0)], "k int, v double"
    )
    t.merge(
        spark,
        src,
        ["k"],
        clauses=[
            {"when": "not_matched", "cond": None, "action": "insert",
             "values": "*"},
        ],
    )
    rows = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert rows == [(1, 10.0), (2, 20.0), (9, 90.0), (9, 95.0)], rows


def test_clause_merge_rejects_struct_expressions_loudly(spark):
    """Clause expressions rewrite references onto the renamed joined
    frame, so struct field access would silently mis-resolve — the
    combination raises instead (whole-row '*' clauses stay allowed)."""
    from nyc_taxi_etl_pyspark_spark.operators.merge import merge_clauses

    base = spark.createDataFrame(
        [(1, {"a": 1})], "k int, s struct<a:int>"
    )
    src = spark.createDataFrame([(2, {"a": 2})], "k int, s struct<a:int>")
    with pytest.raises(ValueError, match="struct-typed"):
        merge_clauses(
            base, src, ["k"],
            [{"when": "matched", "cond": "s.a > 0", "action": "delete"}],
        )
    # whole-row clauses never rewrite expressions: structs pass through
    out = merge_clauses(
        base, src, ["k"],
        [
            {"when": "matched", "cond": None, "action": "update", "set": "*"},
            {"when": "not_matched", "cond": None, "action": "insert",
             "values": "*"},
        ],
    )
    rows = sorted((r.k, r.s.a) for r in out.collect())
    assert rows == [(1, 1), (2, 2)]


def test_purge_deletion_vectors_materializes_and_thresholds(spark, tmp_path):
    """``purge_deletion_vectors`` (REORG ... APPLY (PURGE) shape):
    files past the deadness threshold are rewritten through the
    DV-aware reader (live rows only, no dv stats entry), others are
    retained byte-for-byte; the orphaned sidecar becomes vacuum
    backlog; SQL spells it OPTIMIZE <t> PURGE."""
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml

    root = str(tmp_path / "t")
    t = TransactionalTable(root)
    # partition by k so deletes concentrate deadness in k=0's file
    t.commit(
        spark.range(400)
        .select(F.col("id"), (F.col("id") % 4).alias("k"))
        .repartition(4, "k"),  # one file per partition
        partition_by=["k"],
    )
    t.delete_where(spark, "k = 0 AND id < 360", merge_on_read=True)  # 90% dead
    t.delete_where(spark, "k = 1 AND id < 41", merge_on_read=True)  # 10% dead
    before = dict(t.manifest()["stats"])

    res = t.purge_deletion_vectors(spark, max_dv_fraction=0.5)
    assert res["files_rewritten"] == 1  # only the 90%-dead file
    assert res["rows_purged"] == 90
    cur = t.read(spark)
    assert cur.count() == 300
    assert cur.where("k = 0").count() == 10
    stats = t.manifest()["stats"]
    dv_files = [f for f, s in stats.items() if "dv" in s]
    assert len(dv_files) == 1  # the 10%-dead file keeps its DV
    assert before[dv_files[0]] == stats[dv_files[0]]  # retained verbatim

    # SQL: OPTIMIZE ... PURGE takes the rest (default threshold 0)
    res2 = execute_dml(spark, "OPTIMIZE purge_t PURGE DELETES", {"purge_t": t})
    assert res2["files_rewritten"] == 1 and res2["rows_purged"] == 10
    stats = t.manifest()["stats"]
    assert not any("dv" in s for s in stats.values())
    assert t.read(spark).count() == 300
    assert t.count() == 300

    # idempotent no-op afterwards
    v = t.latest_version()
    assert t.purge_deletion_vectors(spark)["files_rewritten"] == 0
    assert t.latest_version() == v
    # vacuum reclaims the now-orphaned sidecars
    res3 = t.vacuum(retain_versions=1, unreferenced_grace_s=0)
    assert res3["removed_dv_sidecars"] == 2


def test_dv_merge_matches_copy_on_write_and_rewrites_nothing(spark, tmp_path):
    """``merge(..., merge_on_read=True)`` is result-identical to the
    copy-on-write MERGE while retaining every data file byte-for-byte:
    matched positions ride one ``_dvs/`` sidecar, the merge output
    appends, metadata count/time travel/fsck stay exact."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 200), num_files=6, cluster_by=["id"])
    files0 = sorted(t.manifest()["files"])
    src = spark.createDataFrame(
        [(5, 5, 999.0), (120, 0, 888.0), (900, 0, 777.0)],
        "id bigint, k bigint, v double",
    )
    v = t.merge(spark, src, ["id"], merge_on_read=True)
    m = t.manifest()
    assert m["meta"]["strategy"] == "merge-on-read"
    assert all(f in m["files"] for f in files0)  # zero rewrites
    cow = TransactionalTable(str(tmp_path / "cow"))
    cow.commit(_tenk(spark, 200), num_files=6, cluster_by=["id"])
    cow.merge(spark, src, ["id"])
    got = sorted(map(tuple, t.read(spark).collect()))
    want = sorted(map(tuple, cow.read(spark).collect()))
    assert got == want and len(got) == 201
    assert t.count() == 201  # metadata count over the DV'd snapshot
    assert t.read(spark, v - 1).count() == 200  # time travel isolation
    assert t.fsck()["ok"]


def test_dv_merge_duplicate_keys_replay_merge_upsert_fanout(spark, tmp_path):
    """Cardinality parity with ``merge_upsert`` on both duplicate
    shapes: duplicate TARGET keys each take the source values
    (cardinality preserved), duplicate SOURCE keys fan out — exactly
    the documented copy-on-write behavior."""
    from nyc_taxi_etl_pyspark_spark.operators.merge import merge_upsert

    t = TransactionalTable(str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k bigint, s string"
    )
    t.commit(base, num_files=2)
    src = spark.createDataFrame(
        [(1, "X"), (2, "Y"), (2, "Z"), (9, "new")], "k bigint, s string"
    )
    t.merge(spark, src, ["k"], merge_on_read=True)
    got = sorted(map(tuple, t.read(spark).collect()))
    want = sorted(map(tuple, merge_upsert(base, src, ["k"]).collect()))
    assert got == want
    # both target k=1 rows replaced by 'X'; source k=2 fans to Y and Z
    assert got.count((1, "X")) == 2 and {(2, "Y"), (2, "Z")} <= set(got)


def test_dv_merge_latest_by_prereduces_and_stacks_with_dv_deletes(
    spark, tmp_path
):
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 100), num_files=4, cluster_by=["id"])
    t.delete_where(spark, "id < 10", merge_on_read=True)
    t2src = spark.createDataFrame(
        [(50, 0, 1.0), (5, 0, 3.0)], "id bigint, k bigint, v double"
    )
    # latest_by path on a table whose schema carries the ordering column
    t_full = TransactionalTable(str(tmp_path / "t4"))
    t_full.commit(
        spark.createDataFrame(
            [(1, 10.0, 0), (2, 20.0, 0)], "id bigint, v double, seq int"
        ),
        num_files=1,
    )
    batch = spark.createDataFrame(
        [(1, 111.0, 1), (1, 222.0, 2), (3, 30.0, 1)],
        "id bigint, v double, seq int",
    )
    t_full.merge(spark, batch, ["id"], latest_by=["seq"], merge_on_read=True)
    got = {r["id"]: (r["v"], r["seq"]) for r in t_full.read(spark).collect()}
    assert got == {1: (222.0, 2), 2: (20.0, 0), 3: (30.0, 1)}
    # and the stacked delete+merge table: id=5 was dead, so it INSERTS
    t.merge(spark, t2src.where("id = 5"), ["id"], merge_on_read=True)
    rows = t.read(spark).where("id in (5, 50)").collect()
    assert {r["id"] for r in rows} == {5, 50}
    assert t.fsck()["ok"]


def test_dv_merge_clause_form_routes_and_schema_mismatch_rejects(
    spark, tmp_path
):
    """Clause form + merge_on_read routes through the DV decomposition
    (the round-8 reject is lifted); the upsert form still demands the
    full table schema on the source."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 50), num_files=2)
    src = spark.createDataFrame([(1, 1, 9.0)], "id bigint, k bigint, v double")
    t.merge(
        spark,
        src,
        ["id"],
        clauses=[{"when": "matched", "action": "delete"}],
        merge_on_read=True,
    )
    assert t.manifest()["meta"]["strategy"] == "merge-on-read"
    assert t.read(spark).count() == 49
    with pytest.raises(ValueError, match="schema mismatch"):
        t.merge(
            spark,
            src.select("id", "v"),
            ["id"],
            merge_on_read=True,
        )


def test_dv_merge_pure_insert_and_sql_routing(spark, tmp_path):
    """No matched candidate file -> pure-insert append commit (no
    sidecar); SQL star-form MERGE routes merge-on-read from the hint
    and the sticky table property; clause form routes too (r9)."""
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml

    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 50), num_files=2, cluster_by=["id"])
    files0 = sorted(t.manifest()["files"])
    ins = spark.createDataFrame(
        [(1000, 0, 1.0), (2000, 0, 2.0)], "id bigint, k bigint, v double"
    )
    t.merge(spark, ins, ["id"], merge_on_read=True)
    m = t.manifest()
    assert all(f in m["files"] for f in files0)
    assert m["meta"]["dv_commit"] == 0 and t.count() == 52
    assert not any(
        "dv" in s for s in m["stats"].values()
    )  # no sidecar for pure inserts
    # SQL: hint routes the star form through deletion vectors
    ins.createOrReplaceTempView("dvmerge_src")
    execute_dml(
        spark,
        "MERGE /*+ MERGE_ON_READ */ INTO t USING dvmerge_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"t": t},
    )
    assert t.manifest()["meta"]["strategy"] == "merge-on-read"
    assert t.count() == 52  # idempotent upsert of the same batch
    # sticky property routes without a hint
    t.set_properties({"merge_on_read": "true"})
    execute_dml(
        spark,
        "MERGE INTO t USING dvmerge_src AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        tables={"t": t},
    )
    assert t.manifest()["meta"]["strategy"] == "merge-on-read"
    # clause form under the property routes merge-on-read too (r9)
    execute_dml(
        spark,
        "MERGE INTO t USING dvmerge_src AS s ON t.id = s.id "
        "WHEN MATCHED AND s.v > 1.5 THEN UPDATE SET v = s.v + 0.5",
        tables={"t": t},
    )
    assert t.manifest()["meta"].get("strategy") == "merge-on-read"
    assert t.read(spark).where("id = 2000").first()["v"] == 2.5
    # /*+ COPY_ON_WRITE */ hint overrides the property for clause form
    execute_dml(
        spark,
        "MERGE /*+ COPY_ON_WRITE */ INTO t USING dvmerge_src AS s "
        "ON t.id = s.id WHEN MATCHED AND s.v > 1.5 THEN "
        "UPDATE SET v = s.v + 0.5",
        tables={"t": t},
    )
    assert t.manifest()["meta"].get("strategy") != "merge-on-read"
    assert t.read(spark).where("id = 2000").first()["v"] == 2.5


def test_compact_deletion_vectors_collapses_refs_stats_only(spark, tmp_path):
    """``compact_deletion_vectors``: N stacked merge-on-read commits
    leave each touched file referencing N sidecars; compaction
    collapses them to ONE per file in a stats-only commit — no data
    file touched, logical rows/reads exact before and after, position
    counts validated against the recorded ``dv.n``, idempotent."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 400), num_files=4, cluster_by=["id"])
    files0 = sorted(t.manifest()["files"])
    for i in range(5):
        t.merge(
            spark,
            spark.createDataFrame(
                [(i * 40 + j, 0, -1.0) for j in range(3)],
                "id bigint, k bigint, v double",
            ),
            ["id"],
            merge_on_read=True,
        )
    m = t.manifest()
    refs_before = sum(
        len(s.get("dv", {}).get("refs", [])) for s in m["stats"].values()
    )
    assert refs_before > 4  # stacked refs exist
    before = sorted(map(tuple, t.read(spark).collect()))
    res = t.compact_deletion_vectors(spark)
    assert res["files_compacted"] > 0 and res["refs_after"] < refs_before
    m2 = t.manifest()
    # data files untouched; every DV file now carries exactly one ref
    assert all(f in m2["files"] for f in files0)
    assert all(
        len(s["dv"]["refs"]) == 1
        for s in m2["stats"].values()
        if "dv" in s
    )
    assert sorted(map(tuple, t.read(spark).collect())) == before
    assert t.count() == 400 and t.fsck()["ok"]
    # pre-compaction snapshots still read through their own refs
    assert t.read(spark, res["version"] - 1).count() == 400
    # idempotent: nothing above the threshold -> no commit
    again = t.compact_deletion_vectors(spark)
    assert again["version"] == res["version"]
    assert again["files_compacted"] == 0
    # a re-delete on compacted files stacks fresh refs and still reads
    t.delete_where(spark, "id < 5", merge_on_read=True)
    assert t.read(spark).count() == 395
    with pytest.raises(ValueError, match="max_refs"):
        t.compact_deletion_vectors(spark, max_refs=0)


def test_sql_optimize_compact_deletes(spark, tmp_path):
    """``OPTIMIZE t COMPACT DELETES`` routes to
    ``compact_deletion_vectors`` — stacked refs collapse, nothing is
    rewritten, reads stay exact."""
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml

    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(_tenk(spark, 200), num_files=2)
    t.delete_where(spark, "id < 5", merge_on_read=True)
    t.delete_where(spark, "id >= 195", merge_on_read=True)
    files0 = sorted(t.manifest()["files"])
    res = execute_dml(spark, "OPTIMIZE ct COMPACT DELETES", {"ct": t})
    assert res["op"] == "optimize" and res["files_compacted"] == 2
    assert res["refs_before"] == 4 and res["refs_after"] == 2
    assert sorted(t.manifest()["files"]) == files0  # nothing rewritten
    assert t.read(spark).count() == 190 and t.count() == 190


def test_txstream_survives_dv_compaction(spark, tmp_path):
    """``compact_deletion_vectors`` is a stats-only commit — refs
    collapse [r1, r2] -> [c] with identical positions and ``dv.n`` —
    so a live txstream consumer must treat it as a no-op (advice r8:
    the old guard compared the whole dv entry including refs, and the
    documented OPTIMIZE ... COMPACT DELETES maintenance killed
    streams). An actual ``dv.n`` change afterwards still fails."""
    from nyc_taxi_etl_pyspark_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    root = str(tmp_path / "t")
    t = TransactionalTable(root)
    t.commit(_tenk(spark, 400), num_files=2)
    # stack two DV commits BEFORE the stream starts (a started stream
    # would fail on the DV mutation itself, which is the other test)
    t.delete_where(spark, "id < 10", merge_on_read=True)
    t.delete_where(spark, "id >= 390", merge_on_read=True)

    # start AFTER the DV commits (those correctly fail the append-only
    # contract — covered by test_txstream_fails_loudly_on_dv_commit);
    # only the compaction delta and later appends arrive here
    s = (
        spark.readStream.format("txstream")
        .option("path", root)
        .option("startingversion", str(t.latest_version() + 1))
        .load()
    )
    q = (
        s.writeStream.format("memory")
        .queryName("txs_compact")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n0 = spark.table("txs_compact").count()
        assert n0 == 0  # started past the snapshot + DV commits
        res = t.compact_deletion_vectors(spark)
        assert res["files_compacted"] == 2
        q.processAllAvailable()  # must NOT raise: logical no-op
        assert spark.table("txs_compact").count() == n0
        # appends keep flowing after the compaction commit
        t.commit(_tenk(spark, 50), mode="append", num_files=1)
        q.processAllAvailable()
        assert spark.table("txs_compact").count() == n0 + 50
        # but an n-changing DV commit STILL fails loudly
        t.delete_where(spark, "id = 100", merge_on_read=True)
        try:
            q.processAllAvailable()
            raise AssertionError("stream should fail on an n-changing DV")
        except AssertionError:
            raise
        except Exception as exc:  # noqa: BLE001 - StreamingQueryException
            assert "deletion vector" in str(exc) or "append-only" in str(exc)
    finally:
        q.stop()


def test_replace_partitions_subtracts_logical_rows_under_dv(spark, tmp_path):
    """advice r8 (medium): ``replace_partitions`` computed
    dropped_rows from PHYSICAL per-file footer rows; replacing a
    partition whose files carry deletion vectors over-subtracted,
    understating the manifest's logical rows total. The metadata
    count must equal the scanned count after the replace."""
    t = TransactionalTable(str(tmp_path / "t"))
    base = spark.range(400).select(
        F.col("id"), (F.col("id") % 4).alias("p"), (F.col("id") * 2.0).alias("v")
    )
    t.commit(base, partition_by=["p"])
    # attach a DV to partition 0's file(s): 100 physical, 60 logical
    t.delete_where(spark, "p = 0 AND id < 160", merge_on_read=True)
    assert t.count() == 360 and t.read(spark).count() == 360
    # replace partition 0 with 25 fresh rows: logical total must be
    # 300 (other partitions) + 25, NOT 400 - 100(physical) - ... skew
    patch = spark.range(25).select(
        (F.col("id") * 4).alias("id"),
        F.lit(0).cast("long").alias("p"),
        F.lit(-1.0).alias("v"),
    )
    t.commit(patch, mode="replace_partitions", partition_by=["p"])
    assert t.read(spark).count() == 325
    assert t.count() == 325  # metadata count == scan count
    assert t.fsck()["ok"]


def _clause_fixture(spark, tmp_path, name):
    t = TransactionalTable(str(tmp_path / name))
    t.commit(_tenk(spark), num_files=4)
    return t


_CLAUSES = [
    {"when": "matched", "cond": "t.v > 500", "action": "delete"},
    {
        "when": "matched",
        "cond": None,
        "action": "update",
        "set": {"v": "s.v + t.v", "k": "s.k"},
    },
    {
        "when": "not_matched",
        "cond": "s.id < 1100",
        "action": "insert",
        "values": "*",
    },
]


def test_dv_merge_clauses_parity_with_copy_on_write(spark, tmp_path):
    """Clause-form merge-on-read (round-8 verdict #4): conditional
    DELETE + UPDATE + conditional INSERT through the DV route must be
    result-identical to the copy-on-write clause rewrite, while
    rewriting ZERO files — matched rows decompose into one position
    sidecar + a CASE-projected append, and 'keep' rows' files stay
    byte-identical in the snapshot."""
    mor = _clause_fixture(spark, tmp_path, "mor")
    cow = _clause_fixture(spark, tmp_path, "cow")
    src = spark.range(30).select(
        (F.col("id") * 40).alias("id"),
        F.lit(99).cast("long").alias("k"),
        F.lit(-5.0).alias("v"),
    )
    files_before = set(mor.manifest()["files"])
    mor.merge(spark, src, ["id"], clauses=_CLAUSES, merge_on_read=True)
    cow.merge(spark, src, ["id"], clauses=_CLAUSES)
    m = mor.manifest()
    assert m["meta"]["strategy"] == "merge-on-read"
    # every pre-merge file is RETAINED (DVs attach, nothing rewritten)
    assert files_before <= set(m["files"])
    assert len(_dv_sidecars(str(tmp_path / "mor"))) == 1
    got = mor.read(spark).orderBy("id", "k", "v").collect()
    want = cow.read(spark).orderBy("id", "k", "v").collect()
    assert got == want
    assert mor.count() == cow.count() == len(got)
    # 'keep' files carry no dv entry: only files with fired clauses do
    stats = m["stats"]
    dv_files = {f for f, s in stats.items() if s.get("dv")}
    assert dv_files and dv_files <= files_before


def test_dv_merge_clauses_sql_hint_and_property(spark, tmp_path):
    """SQL front door routes clause-form MERGE by hint and by the
    sticky merge_on_read table property — the round-8 reject is
    lifted."""
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml

    t = _clause_fixture(spark, tmp_path, "t")
    spark.range(5).select(
        (F.col("id") * 100).alias("id"),
        F.lit(1).cast("long").alias("k"),
        F.lit(7.5).alias("v"),
    ).createOrReplaceTempView("dvmc_src")
    files_before = set(t.manifest()["files"])
    r = execute_dml(
        spark,
        "MERGE /*+ MERGE_ON_READ */ INTO dvt AS t USING dvmc_src AS s "
        "ON t.id = s.id "
        "WHEN MATCHED AND t.k = 0 THEN UPDATE SET v = s.v "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *",
        {"dvt": t},
    )
    assert r["op"] == "merge" and r["clauses"]
    m = t.manifest()
    assert m["meta"]["strategy"] == "merge-on-read"
    assert files_before <= set(m["files"])
    # ids 0,100,...,400 all exist with k=0 -> all updated, none deleted
    cur = t.read(spark)
    assert cur.count() == 1000
    assert cur.where("id % 100 = 0 AND id < 500 AND v = 7.5").count() == 5

    # property-routed: no hint, sticky table property
    execute_dml(
        spark,
        "ALTER TABLE dvt SET TBLPROPERTIES (merge_on_read = true)",
        {"dvt": t},
    )
    execute_dml(
        spark,
        "MERGE INTO dvt AS t USING dvmc_src AS s ON t.id = s.id "
        "WHEN MATCHED AND t.v = 7.5 THEN DELETE",
        {"dvt": t},
    )
    m2 = t.manifest()
    assert m2["meta"]["strategy"] == "merge-on-read"
    assert t.read(spark).count() == 995


def test_dv_merge_clauses_falls_back_to_cow_when_undecomposable(
    spark, tmp_path
):
    """The two shapes a DV cannot express route to copy-on-write
    automatically: NOT MATCHED BY SOURCE clauses (touch every
    unmatched target row) and NULL source merge keys (band pruning
    cannot see eqNullSafe NULL matches)."""
    t = _clause_fixture(spark, tmp_path, "t")
    src = spark.range(3).select(
        (F.col("id") * 2).alias("id"),
        F.lit(1).cast("long").alias("k"),
        F.lit(0.0).alias("v"),
    )
    t.merge(
        spark,
        src,
        ["id"],
        clauses=[
            {"when": "matched", "cond": None, "action": "update", "set": "*"},
            {
                "when": "not_matched_by_source",
                "cond": "t.id >= 900",
                "action": "delete",
            },
        ],
        merge_on_read=True,
    )
    m = t.manifest()
    assert m["meta"].get("strategy") != "merge-on-read"  # CoW rewrite
    assert t.read(spark).count() == 900
    assert t.read(spark).where("id IN (0, 2, 4)").agg(
        F.sum("v")
    ).first()[0] == 0.0

    # NULL source key: eqNullSafe semantics preserved via CoW
    t2 = _clause_fixture(spark, tmp_path, "t2")
    src_null = spark.createDataFrame(
        [(None, 1, 0.0), (4, 1, 0.0)], "id long, k long, v double"
    )
    t2.merge(
        spark,
        src_null,
        ["id"],
        clauses=[
            {"when": "matched", "cond": None, "action": "update", "set": "*"},
            {"when": "not_matched", "cond": None, "action": "insert",
             "values": "*"},
        ],
        merge_on_read=True,
    )
    assert t2.manifest()["meta"].get("strategy") != "merge-on-read"
    cur = t2.read(spark)
    assert cur.count() == 1001  # NULL key matches no target row: insert
    assert cur.where("id IS NULL").count() == 1
    assert cur.where("id = 4 AND v = 0.0").count() == 1


def test_dv_merge_clauses_insert_only_and_empty_effects(spark, tmp_path):
    """Edge shapes on the DV route: a clause merge whose every fired
    effect is an INSERT (no candidate file holds a source key) appends
    without a sidecar; a merge where NO clause fires commits nothing."""
    t = _clause_fixture(spark, tmp_path, "t")
    v0 = t.latest_version()
    ins = spark.range(3).select(
        (F.col("id") + 5000).alias("id"),
        F.lit(1).cast("long").alias("k"),
        F.lit(1.0).alias("v"),
    )
    t.merge(
        spark,
        ins,
        ["id"],
        clauses=[
            {"when": "matched", "cond": None, "action": "delete"},
            {"when": "not_matched", "cond": None, "action": "insert",
             "values": "*"},
        ],
        merge_on_read=True,
    )
    assert t.latest_version() == v0 + 1
    assert t.read(spark).count() == 1003
    assert _dv_sidecars(str(tmp_path / "t")) == []  # pure insert: no DV

    # no clause fires: matched rows fail the cond, inserts excluded
    v1 = t.latest_version()
    noop = spark.range(2).select(
        F.col("id"), F.lit(1).cast("long").alias("k"), F.lit(1.0).alias("v")
    )
    t.merge(
        spark,
        noop,
        ["id"],
        clauses=[
            {"when": "matched", "cond": "t.v > 1e9", "action": "delete"},
        ],
        merge_on_read=True,
    )
    assert t.latest_version() == v1  # nothing fired: no commit


def test_concurrent_dv_clause_merges_serialize(spark, tmp_path):
    """Two clause-form merge-on-read writers racing on DIFFERENT keys
    must both land through the CAS retry (the DV route recomputes its
    candidates and positions from the new head after a lost race) —
    no lost update, no double-DV, final state exact."""
    import threading

    root = str(tmp_path / "t")
    t = TransactionalTable(root)
    t.commit(_tenk(spark, 400), num_files=4)

    errors: list = []

    def do_merge(lo: int, hi: int, tag: float):
        try:
            src = spark.range(lo, hi).select(
                F.col("id"),
                (F.col("id") % 10).alias("k"),
                F.lit(tag).alias("v"),
            )
            TransactionalTable(root).merge(
                spark,
                src,
                ["id"],
                clauses=[
                    {"when": "matched", "cond": "s.v < 0",
                     "action": "delete"},
                    {"when": "matched", "cond": None, "action": "update",
                     "set": {"v": "s.v"}},
                ],
                merge_on_read=True,
                max_retries=20,
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=do_merge, args=(0, 30, 7.0)),
        threading.Thread(target=do_merge, args=(30, 60, -1.0)),  # deletes
        threading.Thread(target=do_merge, args=(60, 90, 9.0)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    fresh = TransactionalTable(root)
    got = {r["id"]: r["v"] for r in fresh.read(spark).collect()}
    assert len(got) == 370  # ids 30..59 deleted
    for i in range(100):
        if i < 30:
            assert got[i] == 7.0, (i, got[i])
        elif i < 60:
            assert i not in got
        elif i < 90:
            assert got[i] == 9.0, (i, got[i])
        else:
            assert got[i] == i * 2.0
    assert fresh.count() == 370 and fresh.fsck()["ok"]


def test_dv_merge_shuffle_path_matches_broadcast_path(
    spark, tmp_path, monkeypatch
):
    """advice r9: merge-on-read broadcast is SIZE-GATED — a source
    above ``_MERGE_BROADCAST_MAX_KEYS`` distinct keys joins by shuffle
    (a table-sized batch broadcast to every executor is an OOM, not an
    optimization). Forcing the gate to 0 must flip both the upsert and
    clause forms onto the shuffle path with identical results."""
    import nyc_taxi_etl_pyspark_spark.sources.txtable as tx

    src = spark.createDataFrame(
        [(5, 5, 999.0), (120, 0, 888.0), (900, 0, 777.0)],
        "id bigint, k bigint, v double",
    )
    clauses = [
        {
            "when": "matched",
            "cond": None,
            "action": "update",
            "set": {"v": "s.v"},
        },
        {
            "when": "not_matched",
            "cond": None,
            "action": "insert",
            "values": "*",
        },
    ]
    results = {}
    for label in ("broadcast", "shuffle"):
        if label == "shuffle":
            monkeypatch.setattr(tx, "_MERGE_BROADCAST_MAX_KEYS", 0)
        up = TransactionalTable(str(tmp_path / f"up_{label}"))
        up.commit(_tenk(spark, 200), num_files=6, cluster_by=["id"])
        up.merge(spark, src, ["id"], merge_on_read=True)
        cl = TransactionalTable(str(tmp_path / f"cl_{label}"))
        cl.commit(_tenk(spark, 200), num_files=6, cluster_by=["id"])
        cl.merge(spark, src, ["id"], merge_on_read=True, clauses=clauses)
        results[label] = (
            sorted(map(tuple, up.read(spark).collect())),
            sorted(map(tuple, cl.read(spark).collect())),
        )
        assert up.manifest()["meta"]["strategy"] == "merge-on-read"
        assert cl.fsck()["ok"] and up.fsck()["ok"]
    assert results["broadcast"] == results["shuffle"]
    assert len(results["shuffle"][0]) == 201


def test_dv_delete_on_partition_values_needing_uri_encoding(
    spark, tmp_path
):
    """Companion to the encoded-root fix: a PARTITION VALUE whose
    on-disk directory needs URI encoding (space) must still key its
    deletion vector correctly — the scan path is percent-decoded
    before the prefix strip, and _dv_finalize now fails loudly on any
    key that matches no snapshot file instead of recording a DV
    nothing ever reads."""
    t = TransactionalTable(str(tmp_path / "t"))
    t.commit(
        spark.range(40).select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, F.lit("a b"))
            .otherwise(F.lit("c"))
            .alias("p"),
        ),
        partition_by=["p"],
    )
    res = t.delete_where(spark, "id < 10", merge_on_read=True)
    assert res["rows_deleted"] == 10
    assert t.read(spark).count() == 30
    assert t.count() == 30
    assert t.fsck()["ok"]
