"""Batch DataSource over the lake format (sources/lakebatch.py):
spark.read.format("lake") with pushed-filter manifest pruning,
version time travel, partition columns, evolution, empty tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNull

from olist_data_warehouse_spark.sources import lakebatch
from olist_data_warehouse_spark.sources.lakebatch import LakeBatchDataSource
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def registered(spark):
    lakebatch.register(spark)
    return spark


def test_full_read_matches_table_api(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 500).repartition(4),
                         str(tmp_path / "t"))
    r = spark.read.format("lake").option("path", t.path).load()
    assert r.columns == ["k", "g", "v"]
    assert r.count() == 500
    assert r.exceptAll(t.read(spark)).count() == 0
    assert t.read(spark).exceptAll(r).count() == 0


def test_pushed_filters_prune_input_partitions(registered, tmp_path):
    spark = registered
    t = LakeTable.create(
        _df(spark, 0, 1000).repartitionByRange(8, "k"),
        str(tmp_path / "t"),
    )
    ds = LakeBatchDataSource({"path": t.path})
    full = ds.reader(None)
    assert len(full.partitions()) == 8
    # range filter: only the low files survive planning
    rd = ds.reader(None)
    residual = list(rd.pushFilters([GreaterThan(("k",), 874)]))
    assert len(residual) == 1  # every filter returned for row eval
    assert len(rd.partitions()) == 1
    # IN-list: exactly the two straddling files
    rd = ds.reader(None)
    list(rd.pushFilters([In(("k",), (5, 995))]))
    assert len(rd.partitions()) == 2
    # unpushable shapes (IsNull) prune nothing, break nothing
    rd = ds.reader(None)
    list(rd.pushFilters([IsNull(("v",))]))
    assert len(rd.partitions()) == 8
    # end-to-end row semantics stay exact (Spark re-applies the filter)
    r = spark.read.format("lake").option("path", t.path).load()
    assert r.where(F.col("k") > 874).count() == 125
    assert r.where(F.col("k").isin(5, 995)).count() == 2
    assert r.where((F.col("k") < 125) & (F.col("g") == "1")).count() == (
        _df(spark, 0, 1000)
        .where((F.col("k") < 125) & (F.col("g") == "1"))
        .count()
    )
    # fully pruned: correct empty result, not an error
    assert r.where(F.col("k") < 0).count() == 0


def test_version_time_travel_option(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 100), str(tmp_path / "t"))
    t.delete_where(spark, F.col("k") < 20)
    cur = spark.read.format("lake").option("path", t.path).load()
    v0 = (
        spark.read.format("lake").option("path", t.path)
        .option("version", "0").load()
    )
    assert cur.count() == 80 and v0.count() == 100


def test_partitioned_table_reads_and_prunes(registered, tmp_path):
    spark = registered
    t = LakeTable.create(
        _df(spark, 0, 300), str(tmp_path / "t"), partition_by=["g"]
    )
    r = spark.read.format("lake").option("path", t.path).load()
    assert r.columns == ["k", "g", "v"]
    assert r.count() == 300
    assert r.where(F.col("g") == "1").count() == 100
    # equality on the partition column prunes to that partition's files
    ds = LakeBatchDataSource({"path": t.path})
    rd = ds.reader(None)
    list(rd.pushFilters([EqualTo(("g",), "1")]))
    pruned = rd.partitions()
    n_g1 = sum(
        1 for m in t._state()["files"].values()
        if m["partition"]["g"] == "1"
    )
    assert len(pruned) == n_g1


def test_evolution_and_empty_table(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10), str(tmp_path / "t"))
    t.append(
        _df(spark, 10, 15).withColumn("tag", F.lit("x")),
        merge_schema=True,
    )
    r = spark.read.format("lake").option("path", t.path).load()
    assert r.columns == ["k", "g", "v", "tag"]
    assert r.where(F.col("tag").isNull()).count() == 10
    e = LakeTable.create(_df(spark, 0, 0), str(tmp_path / "e"))
    er = spark.read.format("lake").option("path", e.path).load()
    assert er.count() == 0 and er.columns == ["k", "g", "v"]


def test_missing_table_and_path_errors(registered, tmp_path):
    spark = registered
    with pytest.raises(Exception, match="no lake table"):
        spark.read.format("lake").option(
            "path", str(tmp_path / "nope")
        ).load()
    with pytest.raises(Exception, match="requires .option"):
        spark.read.format("lake").load()


# -- write side: df.write.format("lake") -------------------------------


def test_writer_create_append_overwrite_roundtrip(registered, tmp_path):
    spark = registered
    p = str(tmp_path / "w")
    _df(spark, 0, 300).repartition(3).write.format("lake").option(
        "path", p
    ).mode("append").save()
    t = LakeTable(p)
    assert t.version() == 0 and t.read(spark).count() == 300
    # executor-side stats landed for every file and column
    for m in t._state()["files"].values():
        assert set(m["stats"]) == {"k", "g", "v"}
        assert m["stats"]["k"]["nulls"] == 0
    _df(spark, 300, 400).write.format("lake").option("path", p).mode(
        "append"
    ).save()
    assert t.read(spark).count() == 400
    _df(spark, 0, 7).write.format("lake").option("path", p).mode(
        "overwrite"
    ).save()
    assert t.read(spark).count() == 7
    # overwrite is a logged version, not a truncation: time travel holds
    assert t.read(spark, version=1).count() == 400
    # the format round-trips through its own reader
    assert (
        spark.read.format("lake").option("path", p).load().count() == 7
    )


def test_writer_stats_feed_pushdown_pruning(registered, tmp_path):
    """Stats computed on EXECUTORS at write time must be the same
    currency the read side prunes with: write range-clustered, then a
    plain .where() on the clustered column plans fewer files."""
    spark = registered
    p = str(tmp_path / "w")
    _df(spark, 0, 1000).repartitionByRange(8, "k").write.format(
        "lake"
    ).option("path", p).mode("append").save()
    from olist_data_warehouse_spark.sources.lakebatch import (
        LakeBatchDataSource,
    )
    from pyspark.sql.datasource import LessThan

    ds = LakeBatchDataSource({"path": p})
    rd = ds.reader(None)
    list(rd.pushFilters([LessThan(("k",), 125)]))
    assert len(rd.partitions()) < 8
    r = spark.read.format("lake").option("path", p).load()
    assert r.where(F.col("k") < 125).count() == 125


def test_writer_nan_column_records_no_stats(registered, tmp_path):
    """Spark orders NaN above every double; Arrow's min_max ignores
    it. A NaN-bearing file must record NO stats for that column so it
    can never be wrongly pruned."""
    spark = registered
    p = str(tmp_path / "n")
    nan_df = spark.range(5).coalesce(1).select(
        F.col("id").alias("k"),
        F.when(F.col("id") == 2, float("nan"))
        .otherwise(F.col("id") * 1.0)
        .alias("v"),
    )
    nan_df.write.format("lake").option("path", p).mode("append").save()
    t = LakeTable(p)
    (meta,) = t._state()["files"].values()
    assert "v" not in meta["stats"] and "k" in meta["stats"]
    # and the file is a candidate for any v-comparison (never skipped)
    cand, clean = t.prune_files("v", ">", 1e12)
    assert len(cand) == 1 and not clean


def test_writer_validates_schema_and_partitioned(registered, tmp_path):
    spark = registered
    p = str(tmp_path / "w")
    _df(spark, 0, 10).write.format("lake").option("path", p).mode(
        "append"
    ).save()
    with pytest.raises(Exception, match="schema mismatch"):
        spark.range(3).selectExpr("id as zzz").write.format(
            "lake"
        ).option("path", p).mode("append").save()
    with pytest.raises(Exception, match="type mismatch"):
        _df(spark, 0, 3).withColumn(
            "v", F.col("v").cast("float")
        ).write.format("lake").option("path", p).mode("append").save()
    pt = LakeTable.create(
        _df(spark, 0, 10), str(tmp_path / "pt"), partition_by=["g"]
    )
    with pytest.raises(Exception, match="partitioned"):
        _df(spark, 10, 20).write.format("lake").option(
            "path", pt.path
        ).mode("append").save()
