"""Native Arrow write into partitioned lake tables (r10 verdict #2).

Each executor task splits its batches by partition tuple (vectorized
pandas group-indices over ONLY the partition columns), writes one
Hive-laid-out file per (task, tuple) holding data columns only, and
records the tuple + executor-computed stats in the commit. Pins:
value round-trip through the directory encoding (ints, strings needing
escapes, NULLs), partition pruning on natively-written files, both
read paths (LakeTable scan via Spark Hive discovery AND the Python
DataSource constant-fill), overwrite, the unsupported-type and
empty-string refusals, and abort cleanliness.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.sources import lakebatch
from olist_data_warehouse_spark.sources.lakebatch import (
    _hive_escape,
    _hive_value,
)
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


@pytest.fixture()
def registered(spark):
    lakebatch.register(spark)
    return spark


def _pdf(spark, lo, hi):
    # p cycles 0..2 with NULLs every 7th row; c holds chars that need
    # Hive escaping (space, slash, colon, percent) plus unicode
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 != 0, F.col("id") % 3).alias("p"),
        F.when(F.col("id") % 2 == 0, F.lit("a b/c:d%e"))
        .otherwise(F.lit("naïve"))
        .alias("c"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_native_partitioned_append_round_trips(registered, tmp_path):
    spark = registered
    t = LakeTable.create(
        _pdf(spark, 0, 40), str(tmp_path / "t"), partition_by=["p", "c"]
    )
    _pdf(spark, 100, 140).repartition(3).write.format("lake").option(
        "path", t.path
    ).mode("append").save()
    # both read paths agree, including NULL partitions and escaped
    # string values
    via_table = {
        (r["k"], r["p"], r["c"], r["v"])
        for r in t.read(spark).collect()
    }
    via_ds = {
        (r["k"], r["p"], r["c"], r["v"])
        for r in spark.read.format("lake")
        .option("path", t.path)
        .load()
        .collect()
    }
    exp = {
        (r["k"], r["p"], r["c"], r["v"])
        for r in _pdf(spark, 0, 40)
        .unionAll(_pdf(spark, 100, 140))
        .collect()
    }
    assert via_table == exp
    assert via_ds == exp


def test_native_files_carry_tuple_and_prune(registered, tmp_path):
    spark = registered
    t = LakeTable.create(
        _pdf(spark, 0, 40), str(tmp_path / "t"), partition_by=["p"]
    )
    before = set(t._state()["files"])
    _pdf(spark, 100, 140).write.format("lake").option(
        "path", t.path
    ).mode("append").save()
    state = t._state()
    new = {p: m for p, m in state["files"].items() if p not in before}
    assert new
    for p, m in new.items():
        assert "partition" in m, m
        assert m["stats"]["p"]["min"] == m["partition"]["p"]
        # one partition tuple per file: the Hive dir says the same
        seg = [s for s in p.split(os.sep) if "=" in s]
        assert len(seg) == 1
    # pruning skips natively-written files of other partitions
    cand, clean = t.prune_files("p", "=", 2)
    assert any(p in new for p in clean)
    got = t.read(spark, prune=("p", "=", 2)).where(F.col("p") == 2)
    exp = (
        _pdf(spark, 0, 40)
        .unionAll(_pdf(spark, 100, 140))
        .where(F.col("p") == 2)
    )
    assert got.count() == exp.count() > 0


def test_null_partition_lands_in_hive_default_dir(registered, tmp_path):
    spark = registered
    t = LakeTable.create(
        _pdf(spark, 0, 10), str(tmp_path / "t"), partition_by=["p"]
    )
    _pdf(spark, 100, 115).write.format("lake").option(
        "path", t.path
    ).mode("append").save()
    nulls = [
        p
        for p, m in t._state()["files"].items()
        if m.get("partition", {}).get("p") is None and m["rows"] > 0
    ]
    assert nulls
    for p in nulls:
        assert "__HIVE_DEFAULT_PARTITION__" in p
    got = t.read(spark).where(F.col("p").isNull())
    # ids 0,7,...: 0,7,14,21,28,35 from [0,10) -> {0,7}; [100,115) -> {105,112}
    assert {r["k"] for r in got.collect()} == {0, 7, 105, 112}


def test_native_overwrite_partitioned(registered, tmp_path):
    spark = registered
    t = LakeTable.create(
        _pdf(spark, 0, 40), str(tmp_path / "t"), partition_by=["p"]
    )
    _pdf(spark, 200, 210).write.format("lake").option(
        "path", t.path
    ).mode("overwrite").save()
    got = {r["k"] for r in t.read(spark).collect()}
    assert got == set(range(200, 210))
    # time travel still sees the original
    assert t.read(spark, version=0).count() == 40


def test_unsupported_partition_type_refused(registered, tmp_path):
    spark = registered
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("p")
    )
    t = LakeTable.create(df, str(tmp_path / "t"), partition_by=["p"])
    with pytest.raises(Exception, match="dir-encodes only"):
        df.write.format("lake").option("path", t.path).mode(
            "append"
        ).save()
    # the table API remains the supported path
    t.append(df)
    assert t.read(spark).count() == 20


def test_empty_string_partition_value_aborts_cleanly(
    registered, tmp_path
):
    spark = registered
    df = spark.range(10).select(
        F.col("id").alias("k"), F.lit("x").alias("p")
    )
    t = LakeTable.create(df, str(tmp_path / "t"), partition_by=["p"])
    v0 = t.version()
    files0 = set(t._state()["files"])
    bad = spark.range(5).select(
        F.col("id").alias("k"), F.lit("").alias("p")
    )
    with pytest.raises(Exception, match="empty-string partition"):
        bad.write.format("lake").option("path", t.path).mode(
            "append"
        ).save()
    # no commit landed and no stray data file is referenced
    assert t.version() == v0
    assert set(t._state()["files"]) == files0
    assert t.read(spark).count() == 10


def test_mutators_compose_with_native_partitioned_files(
    registered, tmp_path
):
    spark = registered
    t = LakeTable.create(
        _pdf(spark, 0, 40), str(tmp_path / "t"), partition_by=["p"]
    )
    _pdf(spark, 100, 140).write.format("lake").option(
        "path", t.path
    ).mode("append").save()
    t.delete_where(spark, F.col("k") >= 130)
    src = (
        _pdf(spark, 120, 125)
        .withColumn("v", F.lit(-1.0))
    )
    t.merge_into(spark, src, keys=["k"])
    got = t.read(spark)
    assert got.count() == 70  # 40 + 40 - 10 deleted
    assert got.where(F.col("v") == -1.0).count() == 5
    # partition dirs survive the rewrite (merge restages via
    # partition_by, so moved rows keep the Hive layout)
    for p, m in t._state()["files"].items():
        if m["rows"] > 0:
            assert "partition" in m, p


def test_hive_encoding_matches_spark_unescape():
    # over-escaping is sound (Spark decodes any %XX); these pin the
    # exact byte forms Spark's discovery parses back
    assert _hive_value(3) == "3"
    assert _hive_value(None) == "__HIVE_DEFAULT_PARTITION__"
    assert _hive_value(True) == "true"
    assert _hive_value("a b/c:d%e") == "a%20b%2Fc%3Ad%25e"
    assert _hive_value("naïve") == "naïve"  # non-ASCII passes raw
    assert _hive_escape("p") == "p"
    with pytest.raises(ValueError, match="empty-string"):
        _hive_value("")
