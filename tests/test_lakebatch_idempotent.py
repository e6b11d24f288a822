"""Idempotent batch writes (Delta's txnAppId/txnVersion posture) and
partition-scoped compaction (Delta's OPTIMIZE ... WHERE shape).

`df.write.format('lake').option('txn_app', a).option('txn_version', n)`
makes a retried orchestrator job exactly-once: a replayed (app,
version) write drops its staged files and lands NOTHING.
`compact(where=...)` scopes maintenance to the files whose stats
might match — the nightly job compacts yesterday's partition, not the
table (sound because compaction is rewrite-identity).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.sources import lakebatch
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


@pytest.fixture()
def registered(spark):
    lakebatch.register(spark)
    return spark


def _write(df, path, app=None, ver=None, mode="append"):
    w = df.write.format("lake").option("path", path)
    if app is not None:
        w = w.option("txn_app", app)
    if ver is not None:
        w = w.option("txn_version", str(ver))
    w.mode(mode).save()


def test_idempotent_append_replay_lands_nothing(registered, tmp_path):
    spark = registered
    p = str(tmp_path / "t")
    base = spark.range(10).withColumn("v", F.col("id") * 2)
    _write(base, p)
    t = LakeTable(p)
    batch = spark.range(10, 20).withColumn("v", F.col("id") * 2)
    _write(batch, p, app="etl", ver=7)
    assert t.read(spark).count() == 20
    assert t.last_txn_batch("etl") == 7
    v1 = t.version()
    files1 = set(t._state()["files"])
    # the retried job re-runs the SAME write: nothing lands, staged
    # files are reclaimed, version unchanged
    _write(batch, p, app="etl", ver=7)
    assert t.version() == v1
    assert set(t._state()["files"]) == files1
    assert t.read(spark).count() == 20
    data_files = {
        f
        for _r, _d, fs in os.walk(os.path.join(p, "data"))
        for f in fs
    }
    manifest = {os.path.basename(q) for q in t._state()["files"]}
    assert data_files == manifest, "replay left an orphaned staged file"
    # a LOWER version is also a replay; a HIGHER one lands
    _write(batch, p, app="etl", ver=3)
    assert t.version() == v1
    _write(spark.range(20, 25).withColumn("v", F.col("id") * 2),
           p, app="etl", ver=8)
    assert t.read(spark).count() == 25
    assert t.last_txn_batch("etl") == 8
    # a different app is independent
    _write(spark.range(25, 30).withColumn("v", F.col("id") * 2),
           p, app="other", ver=0)
    assert t.read(spark).count() == 30


def test_idempotent_create_records_txn(registered, tmp_path):
    spark = registered
    p = str(tmp_path / "t")
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    _write(df, p, app="boot", ver=1)
    t = LakeTable(p)
    assert t.last_txn_batch("boot") == 1
    _write(df, p, app="boot", ver=1)  # replayed create-then-append
    assert t.read(spark).count() == 5


def test_txn_options_must_come_together(registered, tmp_path):
    spark = registered
    p = str(tmp_path / "t")
    df = spark.range(3).withColumn("v", F.col("id") * 2)
    with pytest.raises(Exception, match="BOTH"):
        _write(df, p, app="etl")
    with pytest.raises(Exception, match="BOTH"):
        _write(df, p, ver=1)


def test_compact_where_scopes_binpack(spark, tmp_path):
    df = spark.range(60).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    )
    t = LakeTable.create(
        df.repartition(4), str(tmp_path / "t"), partition_by=["p"]
    )
    # many small files per partition
    for lo in (100, 200, 300):
        t.append(
            spark.range(lo, lo + 30)
            .select(F.col("id"), (F.col("id") % 3).alias("p"))
            .repartition(4)
        )
    state = t._state()
    other = {
        q: os.path.getmtime(os.path.join(t.path, q))
        for q, m in state["files"].items()
        if m.get("partition", {}).get("p") != 1
    }
    r = t.compact(spark, 256 * 1024 * 1024, where=("p", "=", 1))
    assert r["files_compacted"] > 0
    # out-of-scope partitions byte-untouched
    cur = t._state()["files"]
    for q, mt in other.items():
        assert q in cur
        assert os.path.getmtime(os.path.join(t.path, q)) == mt
    # in-scope partition is compacted, content identical
    got = t.read(spark)
    assert got.count() == 150
    assert got.where(F.col("p") == 1).count() == 50


def test_compact_where_scopes_zorder(spark, tmp_path):
    df = spark.range(4000).select(
        (F.col("id") % 2).alias("half"),
        (F.col("id") % 64).alias("x"),
        (F.pmod(F.hash(F.col("id")), F.lit(64))).alias("y"),
        F.col("id").alias("payload"),
    )
    t = LakeTable.create(
        df.repartition(8), str(tmp_path / "t"), partition_by=["half"]
    )
    other = {
        q: os.path.getmtime(os.path.join(t.path, q))
        for q, m in t._state()["files"].items()
        if m.get("partition", {}).get("half") == 0
    }
    t.compact(
        spark, 3000, cluster_by=["x", "y"], where=("half", "=", 1)
    )
    cur = t._state()["files"]
    for q, mt in other.items():
        assert q in cur
        assert os.path.getmtime(os.path.join(t.path, q)) == mt
    got = t.read(spark)
    assert got.count() == 4000
    assert got.agg(F.sum("payload")).first()[0] == sum(range(4000))
