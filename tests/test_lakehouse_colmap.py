"""Column mapping: RENAME / DROP COLUMN without rewriting a byte (the
Delta column-mapping 'name mode' contract, re-expressed Spark-first).

Physical parquet names are minted once and never change; renames and
drops are metadata-only ``alter`` commits carrying the new logical
schema plus the logical->physical mapping. Every read path (table
scan, prune, batch DataSource, stream, CDF, dv anti-join, time
travel) and every write path (staging choke point) translates at one
place each; unmapped tables take the identical pre-mapping code path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.sources.lakehouse import LakeTable

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, path, n=200, files=2, cdf=False):
    df = spark.range(n).withColumn("v", (F.col("id") % 10).cast("long"))
    return LakeTable.create(
        df.repartitionByRange(files, "id"), path, cdf=cdf
    )


def _sig(t: LakeTable) -> dict[str, tuple]:
    return {
        p: (
            os.path.getsize(os.path.join(t.path, p)),
            os.path.getmtime(os.path.join(t.path, p)),
        )
        for p in t._state()["files"]
    }


def test_rename_is_metadata_only(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    before = _sig(t)
    v0 = t.version()
    t.rename_column("v", "val")
    assert _sig(t) == before  # zero bytes touched
    got = t.read(spark)
    assert got.columns == ["id", "val"]
    assert got.where(F.col("val") == 3).count() == 20
    # time travel reads the OLD logical schema
    old = t.read(spark, version=v0)
    assert old.columns == ["id", "v"]
    assert old.where(F.col("v") == 3).count() == 20


def test_write_and_prune_after_rename(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("id", "ident")
    t.append(
        spark.createDataFrame(
            [(5000, 1)], "ident long, v long"
        ).coalesce(1)
    )
    got = t.read(spark)
    assert got.count() == 201
    assert got.where(F.col("ident") == 5000).count() == 1
    # stats pruning speaks the NEW logical name (stats key physical)
    cand, clean = t.prune_files("ident", ">", 4000)
    assert len(cand) == 1 and len(clean) == 2
    pruned = t.read(spark, prune=[("ident", ">", 4000)])
    assert pruned.where(F.col("ident") == 5000).count() == 1


def test_dropped_column_never_resurrects(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    before = _sig(t)
    v0 = t.version()
    t.drop_column("v")
    assert _sig(t) == before
    assert t.read(spark).columns == ["id"]
    assert t.read(spark, version=v0).columns == ["id", "v"]
    # re-adding 'v' mints a fresh physical: old data must NOT reappear
    t.append(
        spark.createDataFrame([(9000, 77)], "id long, v long"),
        merge_schema=True,
    )
    got = t.read(spark)
    assert got.where(F.col("id") == 9000).collect()[0]["v"] == 77
    assert got.where(F.col("id") < 200).where(
        F.col("v").isNotNull()
    ).count() == 0, "dropped column data resurrected through a re-add"


def test_mutators_on_renamed_column(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("v", "val")
    r = t.delete_where(spark, F.col("val") == 9, mode="dv")
    assert r["rows_deleted"] == 20
    t.update_where(
        spark, F.col("val") == 0, {"val": F.lit(100).cast("long")}
    )
    src = spark.createDataFrame([(1, -1), (5000, -5)], "id long, val long")
    t.merge_into(spark, src, ["id"])
    got = t.read(spark)
    assert got.count() == 181  # 200 - 20 dv + 1 merge insert
    assert got.where(F.col("val") == 9).count() == 0
    assert got.where(F.col("val") == 100).count() == 20
    rows = {x["id"]: x["val"] for x in got.where(
        F.col("id").isin(1, 5000)).collect()}
    assert rows == {1: -1, 5000: -5}


def test_cdf_replays_across_rename(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), cdf=True)
    t.delete_where(spark, F.col("v") == 4)  # pre-images under old name
    t.rename_column("v", "val")
    t.append(spark.createDataFrame([(900, 4)], "id long, val long"))
    ch, _ = t.read_changes_since(spark, -1)
    # full replay under the CURRENT logical schema
    assert set(ch.columns) == {"id", "val", "_change_type",
                               "_commit_version"}
    dels = ch.where(F.col("_change_type") == "delete")
    assert dels.count() == 20
    assert dels.where(F.col("val") != 4).count() == 0
    # fold parity: create - delete + append == current table
    signed = ch.withColumn(
        "_s", F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    )
    folded = (
        signed.groupBy("id", "val")
        .agg(F.sum("_s").alias("_n"))
        .where(F.col("_n") > 0)
        .drop("_n")
    )
    assert folded.exceptAll(t.read(spark)).count() == 0
    assert t.read(spark).exceptAll(folded).count() == 0


def test_batch_datasource_reads_mapped_table(spark, tmp_path):
    from olist_data_warehouse_spark.sources import lakebatch

    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("v", "val")
    lakebatch.register(spark)
    df = spark.read.format("lake").option("path", t.path).load()
    assert df.columns == ["id", "val"]
    assert df.where(F.col("val") == 3).count() == 20
    # pushdown on the renamed sort column still prunes + stays exact
    assert (
        df.where(F.col("id") > 150).count()
        == t.read(spark).where(F.col("id") > 150).count()
    )
    # the native writer targets mapped tables too (r10 verdict #3):
    # the executor renames logical -> physical before writing, so the
    # staged files are indistinguishable from table-API staging
    (
        spark.createDataFrame([(1000, 3)], "id long, val long")
        .write.format("lake")
        .option("path", t.path)
        .mode("append")
        .save()
    )
    assert t.read(spark).where(F.col("id") == 1000).collect()[0][
        "val"
    ] == 3
    # stats on the natively-written file key on the PHYSICAL name
    phys = t._mapping(t._state()).get("val", "val")
    added = [
        m
        for m in t._state()["files"].values()
        if m["rows"] == 1 and m["stats"].get(phys, {}).get("min") == 3
    ]
    assert added, "native mapped write missing physical-keyed stats"


def test_stream_reads_mapped_table(spark, tmp_path):
    from olist_data_warehouse_spark.sources.lakestream import (
        LakeStreamDataSource,
    )

    t = _mk(spark, str(tmp_path / "t"), n=30, files=1)
    t.rename_column("v", "val")
    t.append(spark.createDataFrame([(900, 5)], "id long, val long"))
    spark.dataSource.register(LakeStreamDataSource)
    rows: list = []
    q = (
        spark.readStream.format("lakestream")
        .option("path", t.path)
        .load()
        .writeStream.foreachBatch(
            lambda bdf, bid: rows.extend(bdf.collect())
        )
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(rows) == 31
    vals = {r["id"]: r["val"] for r in rows}
    assert vals[900] == 5 and vals[3] == 3


def test_guards(spark, tmp_path):
    df = spark.range(50).withColumn(
        "bucket", F.when(F.col("id") < 25, "a").otherwise("b")
    ).withColumn("v", (F.col("id") % 5).cast("long"))
    t = LakeTable.create(df, str(tmp_path / "t"), partition_by=["bucket"])
    with pytest.raises(ValueError, match="partition"):
        t.rename_column("bucket", "b2")
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("bucket")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "id")
    with pytest.raises(ValueError, match="identifier"):
        t.rename_column("v", "bad name")
    t.add_constraint(
        t.read(df.sparkSession).sparkSession, "v_nonneg", "v >= 0"
    )
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("v")
    t.drop_constraint("v_nonneg")
    t.rename_column("v", "val")  # now fine
    # schema-changing overwrite refused on a mapped table
    with pytest.raises(ValueError, match="column-mapped"):
        t.overwrite(df.sparkSession.createDataFrame(
            [(1, "a")], "id long, bucket string"))


def test_drop_last_column_refused(spark, tmp_path):
    t = LakeTable.create(spark.range(5), str(tmp_path / "t"))
    with pytest.raises(ValueError, match="last column"):
        t.drop_column("id")


def test_mapping_rides_checkpoints_and_clones(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=50, files=1)
    t.rename_column("v", "val")
    for i in range(12):  # cross a checkpoint boundary
        t.append(
            spark.createDataFrame([(1000 + i, 1)], "id long, val long")
        )
    t2 = LakeTable(t.path)
    assert t2.detail()["column_mapping"] == {"val": "v"}
    assert t2.read(spark).where(F.col("val") == 1).count() >= 12
    c = t.clone_shallow(str(tmp_path / "c"))
    assert c.read(spark).columns == ["id", "val"]
    c.rename_column("val", "w")  # clone diverges independently
    assert c.read(spark).columns == ["id", "w"]
    assert t.read(spark).columns == ["id", "val"]


def test_history_surfaces_column_ddl(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=10, files=1)
    t.rename_column("v", "val")
    t.drop_column("val")
    h = {e["version"]: e for e in t.history()}
    assert h[1]["column"] == {"action": "rename", "from": "v", "to": "val"}
    assert h[2]["column"] == {"action": "drop", "name": "val"}
