"""Unit tests for T-SQL-exact scalar semantics (SURVEY.md §2.7, §7.4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from olist_data_warehouse_spark.functions import (
    date_key_to_date,
    date_to_date_key,
    datediff_hours,
    int_avg,
    surrogate_key,
)


def test_datediff_hours_boundary_semantics(spark):
    """DATEDIFF(HOUR) counts hour-boundary crossings, not elapsed hours."""
    rows = [
        # 23:59 -> 00:01: 2 minutes elapsed, but one hour boundary crossed.
        (dt.datetime(2018, 1, 1, 23, 59), dt.datetime(2018, 1, 2, 0, 1), 1),
        # same hour: 0
        (dt.datetime(2018, 1, 1, 10, 0), dt.datetime(2018, 1, 1, 10, 59), 0),
        # exactly 1h
        (dt.datetime(2018, 1, 1, 10, 30), dt.datetime(2018, 1, 1, 11, 30), 1),
        # negative (won before contact — the reference's `< 1` DELETE case)
        (dt.datetime(2018, 1, 2, 0, 1), dt.datetime(2018, 1, 1, 23, 59), -1),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "a timestamp, b timestamp"
    )
    got = [r[0] for r in df.select(datediff_hours("a", "b")).collect()]
    assert got == [e for _, _, e in rows]


def test_date_key_roundtrip(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2018, 3, 5, 14, 30),)], "ts timestamp"
    )
    out = df.select(
        date_to_date_key("ts").alias("dk"),
        date_key_to_date(date_to_date_key("ts")).alias("d"),
    ).collect()[0]
    assert out.dk == 20180305
    assert out.d == dt.date(2018, 3, 5)


def test_int_avg_floors(spark):
    df = spark.createDataFrame([(1,), (2,), (2,)], "x int")
    assert df.agg(int_avg("x")).collect()[0][0] == 1  # avg=1.666 -> 1


def test_surrogate_key_seeded_and_stable(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "name string")
    got = {
        (r.name, r.k)
        for r in surrogate_key(df, "k", ["name"], start=1000).collect()
    }
    assert got == {("a", 1000), ("b", 1001), ("c", 1002)}


def test_surrogate_key_continue_sequence(spark):
    """Appends continue from max(existing) — Olist DW.sql:71-75."""
    base = spark.createDataFrame([("a",), ("b",)], "name string")
    dim = surrogate_key(base, "k", ["name"], start=1000)
    mx = dim.agg(F.max("k")).collect()[0][0]
    new = spark.createDataFrame([("z",), ("y",)], "name string")
    appended = surrogate_key(new, "k", ["name"], start=mx + 1)
    got = {(r.name, r.k) for r in appended.collect()}
    assert got == {("y", 1002), ("z", 1003)}


def test_profile_operator_counts_ranges_checksum(spark):
    """Generic single-pass profiler: counts nulls correctly, distincts
    exactly, cents checksums exactly, timestamp ranges rendered."""
    from olist_data_warehouse_spark.operators import profiling

    df = spark.createDataFrame(
        [
            (1, "a", 1.25, "2024-01-01 10:00:00"),
            (2, "a", 2.75, "2024-03-05 00:30:00"),
            (3, None, 0.50, "2023-12-31 23:59:59"),
            (4, "b", None, None),
        ],
        "id bigint, k string, price double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = profiling.profile(
        df, key_cols=["k"], money_cols=["price"], ts_cols=["ts"]
    ).collect()[0]
    assert row.n_rows == 4
    assert row.n_k == 3 and row.n_distinct_k == 2
    assert row.min_cents_price == 50 and row.max_cents_price == 275
    assert row.sum_cents_price == 450
    assert row.min_ts == "2023-12-31 23:59:59"
    assert row.max_ts == "2024-03-05 00:30:00"


def test_measure_correlation_partitioning_invariant(spark):
    """a16's five BIGINT second moments are exact partial aggregates,
    so the final statistics are bit-identical under any partition
    layout — the property float-streaming covar_pop/corr lacks."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    base = REGISTRY["a16_measure_correlation"].fn(spark, sf)
    rows_a = sorted(map(tuple, base.collect()))

    from olist_data_warehouse_spark.sources.readers import load_testdata
    from pyspark.sql import functions as F

    li = load_testdata(spark, sf, ("lineitem",))["lineitem"].repartition(17)
    x = F.round(F.col("l_quantity") * 100, 0).cast("long")
    y = F.round(F.col("l_discount") * 10000, 0).cast("long")
    c = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    s = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    rows_b = sorted(
        map(
            tuple,
            s.select(
                "l_returnflag", "n",
                F.round(num / (nd * F.col("n")), 6).alias("cov_xy"),
                F.round(
                    num / (
                        F.sqrt(nd * F.col("sxx")
                               - F.col("sx").cast("double") * F.col("sx"))
                        * F.sqrt(nd * F.col("syy")
                                 - F.col("sy").cast("double") * F.col("sy"))
                    ), 6,
                ).alias("corr_xy"),
            ).collect(),
        )
    )
    assert rows_a == rows_b
