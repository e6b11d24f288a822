"""GENERATED ALWAYS AS columns (Delta's generated-column contract,
fixed at create): omitted -> computed, provided -> validated
atomically, UPDATE refuses direct assignment and RECOMPUTES over the
post-assignment row in both modes, tombstone payloads are never
validated, and DDL guards protect the column and its dependencies.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.sources.lakehouse import LakeTable

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, path, n=100, cdf=False):
    df = spark.range(n).withColumn("v", (F.col("id") % 10).cast("long"))
    return LakeTable.create(
        df, path, cdf=cdf, generated={"v2": "v * 2"}
    )


def test_create_computes_and_validates(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    got = t.read(spark)
    assert got.columns == ["id", "v", "v2"]
    assert got.where(F.col("v2") != F.col("v") * 2).count() == 0
    # create PROVIDING a wrong generated value is refused
    bad = spark.range(5).withColumn(
        "v", F.lit(1).cast("long")
    ).withColumn("v2", F.lit(99).cast("long"))
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        LakeTable.create(
            bad, str(tmp_path / "t2"), generated={"v2": "v * 2"}
        )
    # ... and a correct provided value is accepted
    ok = spark.range(5).withColumn(
        "v", F.lit(3).cast("long")
    ).withColumn("v2", F.lit(6).cast("long"))
    t3 = LakeTable.create(
        ok, str(tmp_path / "t3"), generated={"v2": "v * 2"}
    )
    assert t3.read(spark).where(F.col("v2") != 6).count() == 0


def test_append_computes_when_omitted_validates_when_given(
    spark, tmp_path
):
    t = _mk(spark, str(tmp_path / "t"), n=10)
    t.append(spark.createDataFrame([(100, 7)], "id long, v long"))
    row = t.read(spark).where(F.col("id") == 100).collect()[0]
    assert row["v2"] == 14
    v0 = t.version()
    with pytest.raises(ValueError, match="differs for 1 rows"):
        t.append(
            spark.createDataFrame(
                [(101, 1, 3)], "id long, v long, v2 long"
            )
        )
    assert t.version() == v0
    t.append(
        spark.createDataFrame([(101, 1, 2)], "id long, v long, v2 long")
    )
    assert t.read(spark).count() == 12


def test_update_refuses_direct_set_and_recomputes(spark, tmp_path):
    for mode in ("rewrite", "dv"):
        t = _mk(spark, str(tmp_path / f"t_{mode}"), n=20)
        with pytest.raises(ValueError, match="GENERATED"):
            t.update_where(
                spark, F.col("id") < 5, {"v2": F.lit(0).cast("long")},
                mode=mode,
            )
        # assigning the DEPENDENCY recomputes the generated column
        t.update_where(
            spark, F.col("id") < 5, {"v": F.lit(50).cast("long")},
            mode=mode,
        )
        got = t.read(spark)
        assert got.where(F.col("id") < 5).where(
            F.col("v2") != 100
        ).count() == 0
        assert got.where(F.col("v2") != F.col("v") * 2).count() == 0


def test_merge_and_cdc_apply_generated(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=10)
    # merge source omitting the generated column: computed
    t.merge_into(
        spark,
        spark.createDataFrame([(1, 30), (200, 4)], "id long, v long"),
        ["id"],
    )
    got = {r["id"]: r["v2"] for r in t.read(spark).where(
        F.col("id").isin(1, 200)).collect()}
    assert got == {1: 60, 200: 8}
    # CDC: upsert omits v2 (computed); tombstone's NULL payload is
    # never validated
    src = spark.createDataFrame(
        [(2, None, "d"), (300, 5, "u")], "id long, v long, _op string"
    )
    r = t.apply_changes(spark, src, ["id"])
    assert r["rows_deletes"] == 1 and r["rows_upserts"] == 1
    got = t.read(spark)
    assert got.where(F.col("id") == 2).count() == 0
    assert got.where(F.col("id") == 300).collect()[0]["v2"] == 10
    # a WRONG provided generated value in an upsert is refused
    with pytest.raises(ValueError, match="GENERATED"):
        t.apply_changes(
            spark,
            spark.createDataFrame(
                [(301, 5, 99, "u")],
                "id long, v long, v2 long, _op string",
            ),
            ["id"],
        )


def test_streaming_sink_applies_generated(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=5)
    sink = t.streaming_sink("app")
    sink(spark.createDataFrame([(50, 6)], "id long, v long"), 0)
    assert t.read(spark).where(F.col("id") == 50).collect()[0][
        "v2"
    ] == 12


def test_ddl_guards_and_writer_refusal(spark, tmp_path):
    from olist_data_warehouse_spark.sources import lakebatch

    t = _mk(spark, str(tmp_path / "t"), n=5)
    with pytest.raises(ValueError, match="GENERATED"):
        t.rename_column("v2", "w")
    with pytest.raises(ValueError, match="depends on it"):
        t.drop_column("v")
    lakebatch.register(spark)
    # the native writer now COMPUTES the omitted generated column
    # executor-side (r10 verdict #3) — proof recorded at create
    (
        spark.createDataFrame([(100, 4)], "id long, v long")
        .write.format("lake")
        .option("path", t.path)
        .mode("append")
        .save()
    )
    row = t.read(spark).where(F.col("id") == 100).collect()[0]
    assert row["v2"] == 8
    assert t.detail()["generated"] == {"v2": "v * 2"}


def test_create_validation(spark, tmp_path):
    df = spark.range(5).withColumn("v", F.lit(1).cast("long"))
    with pytest.raises(ValueError, match="does not resolve"):
        LakeTable.create(
            df, str(tmp_path / "a"), generated={"g": "nope + 1"}
        )
    with pytest.raises(ValueError, match="identifier"):
        LakeTable.create(
            df, str(tmp_path / "b"), generated={"bad name": "v"}
        )
    with pytest.raises(ValueError, match="cannot be generated"):
        LakeTable.create(
            df, str(tmp_path / "c"),
            partition_by=["v"], generated={"v": "id"},
        )


def test_cdf_carries_recomputed_values(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=10, cdf=True)
    v0 = t.version()
    t.update_where(spark, F.col("id") == 3, {"v": F.lit(9).cast("long")})
    ch, _ = t.read_changes_since(spark, v0)
    ins = ch.where(F.col("_change_type") == "insert").collect()
    assert len(ins) == 1 and ins[0]["v2"] == 18
