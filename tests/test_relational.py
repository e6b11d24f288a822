"""zip_with_index: dense, deterministic, partition-count-invariant
key assignment (the billion-row surrogate_key alternative promised by
functions/keys.py — r11 verdict item #3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_data_warehouse_spark.functions.keys import surrogate_key
from olist_data_warehouse_spark.operators.relational import zip_with_index


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _keymap(df):
    return {
        r["o_orderkey"]: r["k"] for r in df.select("o_orderkey", "k").collect()
    }


def test_dense_from_start(spark, sf_dir):
    df = _orders(spark, sf_dir)
    n = df.count()
    out = zip_with_index(df, "k", ["o_orderkey"], start=1000)
    got = out.agg(
        F.min("k").alias("lo"),
        F.max("k").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("k").alias("nd"),
    ).first()
    assert (got["lo"], got["hi"], got["n"], got["nd"]) == (
        1000,
        1000 + n - 1,
        n,
        n,
    )


def test_matches_global_window_semantics(spark, sf_dir):
    """Same contract as surrogate_key: key order follows order_by."""
    df = _orders(spark, sf_dir)
    want = _keymap(surrogate_key(df, "k", ["o_orderkey"], start=1))
    got = _keymap(zip_with_index(df, "k", ["o_orderkey"], start=1))
    assert got == want


def test_partition_count_invariant(spark, sf_dir):
    """The assignment depends only on values: reshaping the input or
    changing num_partitions must not move a single key."""
    df = _orders(spark, sf_dir)
    base = _keymap(zip_with_index(df, "k", ["o_orderkey"]))
    for shaped, n in [
        (df.repartition(3), 4),
        (df.repartition(13, "o_custkey"), 1),
        (df.coalesce(1), 7),
    ]:
        assert (
            _keymap(zip_with_index(shaped, "k", ["o_orderkey"], num_partitions=n))
            == base
        )


def test_deterministic_across_runs(spark, sf_dir):
    df = _orders(spark, sf_dir)
    a = _keymap(zip_with_index(df, "k", ["o_orderkey"], start=500))
    b = _keymap(zip_with_index(df, "k", ["o_orderkey"], start=500))
    assert a == b


def test_continue_sequence_for_appends(spark, sf_dir):
    """start=max+1 continues the sequence — the Olist DW.sql:71-75
    append shape."""
    df = _orders(spark, sf_dir)
    first = zip_with_index(
        df.where(F.col("o_orderkey") % 2 == 0), "k", ["o_orderkey"]
    )
    hi = first.agg(F.max("k")).first()[0]
    second = zip_with_index(
        df.where(F.col("o_orderkey") % 2 != 0),
        "k",
        ["o_orderkey"],
        start=hi + 1,
    )
    ks = [r["k"] for r in first.union(second).select("k").collect()]
    assert sorted(ks) == list(range(1, len(ks) + 1))


def test_empty_input(spark, sf_dir):
    df = _orders(spark, sf_dir).where(F.lit(False))
    out = zip_with_index(df, "k", ["o_orderkey"])
    assert out.count() == 0
    assert "k" in out.columns


def test_rejects_reserved_and_missing(spark, sf_dir):
    import pytest

    df = _orders(spark, sf_dir)
    with pytest.raises(ValueError, match="order_by"):
        zip_with_index(df, "k", [])
    with pytest.raises(ValueError, match="_zwi_bkt"):
        zip_with_index(df.withColumn("_zwi_bkt", F.lit(1)), "k", ["o_orderkey"])
