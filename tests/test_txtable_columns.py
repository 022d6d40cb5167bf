"""RENAME / DROP COLUMN via column mapping (``txtable.rename_column``
/ ``drop_column`` — Delta's name-mapping mode; no reference
counterpart, the reference has no storage layer).

Contract under test: both are METADATA-ONLY commits. The PHYSICAL
parquet column name never changes, so no file is rewritten; the
manifest (schema, per-file stats, partition_by, bloom/clustering
declarations) speaks LOGICAL names, and the sticky ``column_mapping``
/ ``dropped_columns`` translate exactly at the two physical
boundaries — scan exit and stage entry. Every read and write path
(band/bloom/partition pruning, DML, merge-on-read, optimize, clone,
restore, time travel, streaming sources, SQL front door) must keep
working across a rename, under the new name only.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_pyspark_spark.sources.txtable import TransactionalTable


def _tbl(spark, tmp_path, name="t", partition=False):
    t = TransactionalTable(str(tmp_path / name))
    t.commit(
        spark.range(100).select(
            F.col("id"),
            (F.col("id") % 4).alias("p"),
            (F.col("id") * 2.0).alias("v"),
        ),
        partition_by=["p"] if partition else None,
        cluster_by=None if partition else ["id"],
        bloom_by=["id"],
        num_files=1 if partition else 4,
    )
    return t


def test_rename_column_is_metadata_only_and_every_path_follows(
    spark, tmp_path
):
    t = _tbl(spark, tmp_path)
    files0 = sorted(t.manifest()["files"])
    t.rename_column("v", "amount")
    m = t.manifest()
    assert sorted(m["files"]) == files0  # zero rewrites
    assert m["meta"]["column_mapping"] == {"amount": "v"}
    assert "amount" in m["schema"] and "v" not in m["schema"]
    # per-file stats rewrote to the logical name (band pruning works)
    assert all("amount" in fs["cols"] for fs in m["stats"].values())
    df = t.read(spark)
    assert df.columns == ["id", "p", "amount"]
    assert df.agg(F.sum("amount")).first()[0] == sum(i * 2.0 for i in range(100))
    # band read on the NEW name prunes via rewritten stats and filters
    assert t.read(spark, where=[("amount", 10.0, 20.0)]).count() == 6
    # bloom point read (id untouched by the rename)
    assert t.read(spark, equals={"id": 42}).count() == 1
    # append through the new name — staged under the PHYSICAL name
    t.commit(
        spark.createDataFrame(
            [(500, 0, 1.5)], "id bigint, p bigint, amount double"
        ),
        mode="append",
    )
    assert t.read(spark).where("id = 500").first()["amount"] == 1.5
    # the staged file's pages store the physical name
    import pyarrow.parquet as pq

    new_file = [f for f in t.manifest()["files"] if f not in files0][0]
    names = pq.ParquetFile(t.storage.url(new_file)).schema_arrow.names
    assert "v" in names and "amount" not in names
    # DML under the new name: CoW update, DV delete, MoR merge
    t.update_where(spark, {"amount": "amount + 100"}, "id = 500")
    assert t.read(spark).where("id = 500").first()["amount"] == 101.5
    t.delete_where(spark, "amount > 101", merge_on_read=True)
    assert t.read(spark).where("id = 500").count() == 0
    t.merge(
        spark,
        spark.createDataFrame(
            [(7, 3, -7.0)], "id bigint, p bigint, amount double"
        ),
        ["id"],
        merge_on_read=True,
    )
    assert t.read(spark).where("id = 7").first()["amount"] == -7.0
    # time travel reads each version under ITS OWN names
    assert t.read(spark, 0).columns == ["id", "p", "v"]
    assert t.count() == t.read(spark).count()
    assert t.fsck()["ok"]


def test_rename_partition_column_keeps_pruning(spark, tmp_path):
    t = _tbl(spark, tmp_path, partition=True)
    t.rename_column("p", "bucket")
    m = t.manifest()
    assert m["partition_by"] == ["bucket"]
    assert t.read(spark, partitions={"bucket": [2]}).count() == 25
    # append lands in the right PHYSICAL partition dir
    t.commit(
        spark.createDataFrame(
            [(900, 2, 0.0)], "id bigint, bucket bigint, v double"
        ),
        mode="append",
    )
    assert t.read(spark, partitions={"bucket": [2]}).count() == 26
    assert t.fsck()["ok"]


def test_rename_guards(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "id")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    t.add_constraint(spark, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("v", "amount")
    t.drop_constraint("v_pos")
    t.rename_column("v", "amount")
    # the retired physical name cannot be taken by a rename or an ADD
    with pytest.raises(ValueError, match="physical name"):
        t.rename_column("id", "v")
    with pytest.raises(ValueError, match="retired physical"):
        t.add_columns(spark, {"v": "double"})
    # rename back to the original physical name empties the mapping
    t.rename_column("amount", "v")
    assert t.manifest()["meta"]["column_mapping"] == {}
    assert t.read(spark).columns == ["id", "p", "v"]


def test_drop_column_tombstones_and_guards(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.rename_column("v", "amount")
    t.drop_column("amount")
    m = t.manifest()
    assert "amount" not in m["schema"]
    assert m["meta"]["dropped_columns"] == ["v"]  # PHYSICAL tombstone
    assert m["meta"]["column_mapping"] == {}
    df = t.read(spark)
    assert df.columns == ["id", "p"]
    # re-adding the tombstoned PHYSICAL name is blocked forever...
    with pytest.raises(ValueError, match="retired physical"):
        t.add_columns(spark, {"v": "double"})
    # ...but a FRESH name is fine and NULL-fills (no resurrection)
    t.add_columns(spark, {"amount": "double"})
    assert (
        t.read(spark).where("amount IS NOT NULL").count() == 0
    )  # old v values do NOT leak into the new column
    # guards
    tp = _tbl(spark, tmp_path, "tp", partition=True)
    with pytest.raises(ValueError, match="partition column"):
        tp.drop_column("p")
    tc = _tbl(spark, tmp_path, "tc")  # cluster_by=["id"]
    with pytest.raises(ValueError, match="clustering"):
        tc.drop_column("id")
    tc.add_constraint(spark, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        tc.drop_column("v")


def test_rename_restore_clone_and_changes_guard(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    v_pre = t.latest_version()
    t.rename_column("v", "amount")
    t.commit(
        spark.createDataFrame(
            [(700, 1, 3.0)], "id bigint, p bigint, amount double"
        ),
        mode="append",
    )
    # clones carry the mapping (shallow and deep)
    sh = TransactionalTable(str(tmp_path / "sh"))
    sh.clone_from(t)
    assert sh.read(spark).columns == ["id", "p", "amount"]
    assert sh.read(spark).where("id = 700").count() == 1
    dp = TransactionalTable(str(tmp_path / "dp"))
    dp.clone_from(t, deep=True)
    assert dp.read(spark).columns == ["id", "p", "amount"]
    # changes() refuses to diff across the rename boundary...
    with pytest.raises(ValueError, match="RENAME/DROP COLUMN"):
        t.changes(spark, ["id"], v_pre)
    # ...but works inside the post-rename window, under the new name
    feed = t.changes(spark, ["id"], v_pre + 1)
    assert {r["_change_type"] for r in feed.collect()} == {"insert"}
    assert feed.columns == ["id", "p", "amount", "_change_type"]
    # restore to the pre-rename version: names travel with the SCHEMA
    t.restore(v_pre)
    assert t.read(spark).columns == ["id", "p", "v"]
    assert t.manifest()["meta"].get("column_mapping") == {}
    assert t.read(spark).count() == 100 and t.fsck()["ok"]


def test_rename_survives_optimize_and_widen(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.commit(
        spark.range(50).select(
            (F.col("id") + 1000).alias("id"),
            (F.col("id") % 4).alias("p"),
            (F.col("id") * 1.0).alias("v"),
        ),
        mode="append",
    )
    t.rename_column("v", "amount")
    t.optimize(spark, target_rows_per_file=1000)
    df = t.read(spark)
    assert df.columns == ["id", "p", "amount"] and df.count() == 150
    # post-optimize files were staged under the physical name and the
    # rewritten stats key the logical one — band pruning still exact
    assert t.read(spark, where=[("amount", 0.0, 1.0)]).count() == 3
    # widening a renamed column routes the explicit reader schema
    # through the PHYSICAL name
    t2 = TransactionalTable(str(tmp_path / "w"))
    t2.commit(
        spark.range(10).select(
            F.col("id"), F.col("id").cast("int").alias("n")
        )
    )
    t2.rename_column("n", "counter")
    t2.alter_column_type(spark, "counter", "bigint")
    got = t2.read(spark)
    assert dict(got.dtypes)["counter"] == "bigint"
    assert got.agg(F.sum("counter")).first()[0] == 45
    assert t2.fsck()["ok"]


def test_rename_streaming_sources_emit_logical_names(spark, tmp_path):
    import time as _time

    t = _tbl(spark, tmp_path)
    t.rename_column("v", "amount")
    t.commit(
        spark.createDataFrame(
            [(800, 0, 8.0)], "id bigint, p bigint, amount double"
        ),
        mode="append",
    )
    from nyc_taxi_etl_pyspark_spark.sources.pyds import (
        register_python_sources,
    )

    register_python_sources(spark)
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("txstream")
        .option("path", t.root)
        .load()
        .writeStream.format("memory")
        .queryName("cm_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cm_stream").collect()
    assert len(rows) == 101
    assert "amount" in rows[0].asDict()
    assert {r["amount"] for r in rows if r["id"] == 800} == {8.0}
    _ = out


def test_rename_sql_routes(spark, tmp_path):
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml

    t = _tbl(spark, tmp_path)
    r = execute_dml(
        spark, "ALTER TABLE t RENAME COLUMN v TO amount", tables={"t": t}
    )
    assert r["op"] == "rename_column" and r["to"] == "amount"
    execute_dml(
        spark,
        "UPDATE t SET amount = 0 WHERE id < 10",
        tables={"t": t},
    )
    assert t.read(spark).where("amount = 0").count() == 10
    r = execute_dml(
        spark, "ALTER TABLE t DROP COLUMN amount", tables={"t": t}
    )
    assert r["op"] == "drop_column"
    assert t.read(spark).columns == ["id", "p"]
    d = t.describe()
    assert d["dropped_columns"] == ["v"] and d["column_mapping"] == {}


def test_generated_column_lifecycle(spark, tmp_path):
    """GENERATED ALWAYS AS (round 10, beyond Delta's creation-time
    restriction): added by ALTER as a schema-only commit. Existing
    rows compute the expression at read (coalesce(physical, expr) —
    exact because the write gate enforces physical == expr
    fail-closed), writes omitting the column derive it, writes
    supplying a WRONG value reject whole, and rewrites materialize it
    physically."""
    from nyc_taxi_etl_pyspark_spark.sources.txsql import execute_dml
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        ConstraintViolation,
    )

    t = _tbl(spark, tmp_path)
    r = execute_dml(
        spark,
        "ALTER TABLE t ADD COLUMN tax double GENERATED ALWAYS AS "
        "(v * 0.1)",
        tables={"t": t},
    )
    assert r["op"] == "add_generated_column"
    # pre-ALTER rows compute at read
    df = t.read(spark)
    assert df.where("abs(tax - v * 0.1) > 1e-9").count() == 0
    assert df.where("tax IS NULL").count() == 0
    # append OMITTING the column derives it (API and SQL routes)
    t.commit(
        spark.createDataFrame(
            [(600, 0, 30.0)], "id bigint, p bigint, v double"
        ),
        mode="append",
    )
    assert t.read(spark).where("id = 600").first()["tax"] == 3.0
    execute_dml(
        spark,
        "INSERT INTO t SELECT CAST(601 AS BIGINT) AS id, "
        "CAST(0 AS BIGINT) AS p, CAST(50.0 AS DOUBLE) AS v",
        tables={"t": t},
    )
    assert t.read(spark).where("id = 601").first()["tax"] == 5.0
    # supplying a CORRECT value passes; a WRONG one rejects whole
    t.commit(
        spark.createDataFrame(
            [(602, 0, 10.0, 1.0)],
            "id bigint, p bigint, v double, tax double",
        ),
        mode="append",
    )
    head = t.latest_version()
    with pytest.raises(ConstraintViolation, match="__generated_tax"):
        t.commit(
            spark.createDataFrame(
                [(603, 0, 10.0, 99.0)],
                "id bigint, p bigint, v double, tax double",
            ),
            mode="append",
        )
    assert t.latest_version() == head
    # DML: updating a BASE column RE-DERIVES unassigned generated
    # columns from the post-assignment row (the Delta behavior) —
    # both copy-on-write and deletion-vector forms
    t.update_where(spark, {"v": "v * 2"}, "id = 600")
    assert t.read(spark).where("id = 600").first()["tax"] == 6.0
    t.update_where(spark, {"v": "v + 40"}, "id = 600", merge_on_read=True)
    assert t.read(spark).where("id = 600").first()["tax"] == 10.0
    # an EXPLICITLY assigned generated value faces the equality gate
    with pytest.raises(ConstraintViolation, match="__generated_tax"):
        t.update_where(spark, {"tax": "42.0"}, "id = 600")
    # optimize materializes generated values physically; reads agree
    t.optimize(spark, target_rows_per_file=1000)
    df = t.read(spark)
    assert df.where("abs(tax - v * 0.1) > 1e-9").count() == 0
    # guards: can't rename/drop the base column under a generation
    with pytest.raises(ValueError, match="generated column"):
        t.rename_column("v", "value")
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("v")
    # dropping the GENERATED column itself clears the rule
    t.drop_column("tax")
    assert t.generated_columns() == {}
    t.rename_column("v", "value")  # now allowed
    assert t.read(spark).columns == ["id", "p", "value"]
    assert t.describe()["generated_columns"] == {}
    assert t.fsck()["ok"]


def test_replace_where_derives_and_gates_generated_columns(
    spark, tmp_path
):
    """advice r10 — replace_where must mirror commit()'s write gate:
    a frame OMITTING a GENERATED ALWAYS AS column derives it; a frame
    supplying a WRONG generated value rejects whole (else the
    physical == expr invariant behind the read-side
    coalesce(physical, expr) breaks silently)."""
    from nyc_taxi_etl_pyspark_spark.sources.txtable import (
        ConstraintViolation,
    )

    t = _tbl(spark, tmp_path)
    t.add_generated_column(spark, "tax", "double", "v * 0.1")
    # omit the generated column: derived, not schema-mismatch
    res = t.replace_where(
        spark,
        spark.createDataFrame(
            [(700, 1, 20.0)], "id bigint, p bigint, v double"
        ),
        "p = 1",
    )
    assert res["rows_appended"] == 1
    assert t.read(spark).where("id = 700").first()["tax"] == 2.0
    # wrong supplied value: fail-closed, nothing committed
    head = t.latest_version()
    with pytest.raises(ConstraintViolation, match="__generated_tax"):
        t.replace_where(
            spark,
            spark.createDataFrame(
                [(701, 1, 20.0, 99.0)],
                "id bigint, p bigint, v double, tax double",
            ),
            "p = 1",
        )
    assert t.latest_version() == head
    # correct supplied value passes the equality gate
    t.replace_where(
        spark,
        spark.createDataFrame(
            [(702, 1, 30.0, 3.0)],
            "id bigint, p bigint, v double, tax double",
        ),
        "p = 1",
    )
    assert {r["id"] for r in t.read(spark).where("p = 1").collect()} == {702}
    assert t.fsck()["ok"]


def test_generated_column_restore_and_clone(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    v_pre = t.latest_version()
    t.add_generated_column(spark, "tax", "double", "v * 0.5")
    sh = TransactionalTable(str(tmp_path / "sh"))
    sh.clone_from(t)
    assert sh.generated_columns() == {"tax": "v * 0.5"}
    assert sh.read(spark).where("tax IS NULL").count() == 0
    t.restore(v_pre)  # generation travels with the schema
    assert t.generated_columns() == {}
    assert t.read(spark).columns == ["id", "p", "v"]
