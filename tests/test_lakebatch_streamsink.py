"""Native streaming sink: ``writeStream.format("lake")`` (r10 verdict
item #5).

The DataSource ``streamWriter`` shares the batch writer's whole write
path (per-task Arrow streaming, executor stats, partition routing,
governed-table proofs) and lands each micro-batch under the
exactly-once txn protocol of ``LakeTable.streaming_sink``: commits
carry ``txn = {app, batch}``, a replayed epoch (same ``batchId``)
drops its staged files and lands nothing. Pins: end-to-end drain
parity, checkpoint-restart continuation without duplicates, the
epoch-replay no-double-commit contract at the commit level, required
``app`` option, append-only refusal, governed and partitioned sinks.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from olist_data_warehouse_spark.sources import lakebatch, lakestream
from olist_data_warehouse_spark.sources.lakebatch import (
    LakeBatchDataSource,
    LakeStreamSinkWriter,
)
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


@pytest.fixture()
def registered(spark):
    lakebatch.register(spark)
    lakestream.register(spark)
    return spark


def _rows(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def _drain_into(spark, src, dst, ck, app="appX", timeout=180):
    writer = (
        spark.readStream.format("lakestream")
        .option("path", src.path)
        .load()
        .writeStream.format("lake")
        .option("path", dst)
        .option("app", app)
        .option("checkpointLocation", ck)
    )
    return lakestream.drain(writer, src.path, timeout=timeout)


def test_stream_sink_end_to_end_exactly_once(registered, tmp_path):
    spark = registered
    src = LakeTable.create(
        _rows(spark, 0, 10).coalesce(1), str(tmp_path / "src")
    )
    for j in (1, 2, 3):
        src.append(_rows(spark, 10 * j, 10 * j + 10).coalesce(1))
    dst = str(tmp_path / "dst")
    _drain_into(spark, src, dst, str(tmp_path / "ck"))
    t = LakeTable(dst)
    got = t.read(spark)
    assert got.count() == 40
    assert got.select("id").distinct().count() == 40
    hist = t.history()
    assert all(
        h["op"] in ("create", "stream_append") for h in hist
    ), hist
    assert t.last_txn_batch("appX") >= 0
    vs = t._commit_versions()
    assert vs == list(range(len(vs)))
    # restart from the SAME checkpoint with new source data: the
    # query continues at the next batch, zero duplicates
    src.append(_rows(spark, 40, 50).coalesce(1))
    _drain_into(spark, src, dst, str(tmp_path / "ck"))
    got = t.read(spark)
    assert got.count() == 50
    assert got.select("id").distinct().count() == 50


def test_epoch_replay_drops_staged_files(registered, tmp_path):
    spark = registered
    src = LakeTable.create(
        _rows(spark, 0, 10).coalesce(1), str(tmp_path / "src")
    )
    dst = str(tmp_path / "dst")
    _drain_into(spark, src, dst, str(tmp_path / "ck"))
    t = LakeTable(dst)
    w = LakeStreamSinkWriter(
        app="appX",
        path=dst,
        schema_json=json.dumps(t.read(spark).schema.jsonValue()),
        overwrite=False,
        exists=True,
    )
    msg = w.write(iter(t.read(spark).limit(2).toArrow().to_batches()))
    staged = json.loads(msg.files_json)
    v0, n0 = t.version(), t.read(spark).count()
    w.commit([msg], t.last_txn_batch("appX"))  # replayed epoch
    assert t.version() == v0
    assert t.read(spark).count() == n0
    for f in staged:
        assert not os.path.exists(os.path.join(dst, f["path"]))
    # a FRESH batch id commits normally
    msg2 = w.write(iter(t.read(spark).limit(2).toArrow().to_batches()))
    w.commit([msg2], t.last_txn_batch("appX") + 1)
    assert t.version() == v0 + 1
    assert t.read(spark).count() == n0 + 2


def test_app_required_and_append_only(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_rows(spark, 0, 5), str(tmp_path / "t"))
    schema = t.read(spark).schema
    ds = LakeBatchDataSource({"path": t.path})
    with pytest.raises(ValueError, match="option\\('app'"):
        ds.streamWriter(schema, False)
    ds2 = LakeBatchDataSource({"path": t.path, "app": "a"})
    with pytest.raises(ValueError, match="append-only"):
        ds2.streamWriter(schema, True)
    assert isinstance(
        ds2.streamWriter(schema, False), LakeStreamSinkWriter
    )
    # the batch idempotence options don't apply here — the sink's own
    # app + epoch protocol is the dedup; silent ignoring would mislead
    ds3 = LakeBatchDataSource(
        {"path": t.path, "app": "a", "txn_app": "x", "txn_version": "1"}
    )
    with pytest.raises(ValueError, match="BATCH idempotence"):
        ds3.streamWriter(schema, False)


def test_governed_stream_sink(registered, tmp_path):
    """The sink inherits the governed write path: generated columns
    compute per micro-batch; a constraint violation fails the QUERY
    and nothing commits."""
    spark = registered
    src = LakeTable.create(
        _rows(spark, 1, 11).coalesce(1), str(tmp_path / "src")
    )
    dst_t = LakeTable.create(
        _rows(spark, 100, 101).withColumn(
            "v3", (F.col("v") * 3).cast("long")
        ),
        str(tmp_path / "dst"),
        generated={"v3": "CAST(v * 3 AS BIGINT)"},
    )
    dst_t.add_constraint(spark, "id_pos", "id > 0")
    _drain_into(spark, src, dst_t.path, str(tmp_path / "ck"))
    got = dst_t.read(spark)
    assert got.count() == 11
    assert (
        got.where(F.col("v3") != F.col("v") * 3).count() == 0
    )
    # violating stream: id = 0 breaks the CHECK -> query fails, no
    # commit, no stray file
    bad_src = LakeTable.create(
        _rows(spark, 0, 3).coalesce(1), str(tmp_path / "bad")
    )
    v0 = dst_t.version()
    files0 = set(dst_t._state()["files"])
    with pytest.raises(Exception, match="CHECK constraint violation"):
        _drain_into(
            spark,
            bad_src,
            dst_t.path,
            str(tmp_path / "ck_bad"),
            timeout=120,
        )
    assert dst_t.version() == v0
    assert set(dst_t._state()["files"]) == files0


def test_partitioned_stream_sink(registered, tmp_path):
    spark = registered
    src = LakeTable.create(
        spark.range(0, 30)
        .withColumn("p", F.col("id") % 3)
        .coalesce(1),
        str(tmp_path / "src"),
    )
    dst_t = LakeTable.create(
        spark.range(100, 101).withColumn("p", F.col("id") % 3),
        str(tmp_path / "dst"),
        partition_by=["p"],
    )
    _drain_into(spark, src, dst_t.path, str(tmp_path / "ck"))
    got = dst_t.read(spark)
    assert got.count() == 31
    for m in dst_t._state()["files"].values():
        if m["rows"] > 0:
            assert "partition" in m
    # pruning covers stream-sunk files (10 streamed + the p=1 seed)
    assert (
        dst_t.read(spark, prune=("p", "=", 1))
        .where(F.col("p") == 1)
        .count()
        == 11
    )
