"""Sketch accuracy: the estimates must actually estimate — HLL within
its theoretical error envelope against exact distinct counts, histogram
quantiles within one bin width of exact quantiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import sketches


def test_hll_tracks_exact_distinct_within_error_bound(spark):
    # groups with very different cardinalities: 50, 500, 2000
    rows = [("a", i % 50) for i in range(4000)]
    rows += [("b", i % 500) for i in range(4000)]
    rows += [("c", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    est = {
        r.g: r.approx_distinct
        for r in sketches.hll_distinct(df, ["g"], F.col("v")).collect()
    }
    exact = {"a": 50, "b": 500, "c": 2000}
    for g, n in exact.items():
        # m=64 → sigma ~= 1.04/8 = 13%; allow 3 sigma
        assert abs(est[g] - n) / n < 0.4, (g, est[g], n)


def test_hll_is_insensitive_to_duplication_and_order(spark):
    base = [("g", i) for i in range(300)]
    df1 = spark.createDataFrame(base, "g string, v bigint")
    df2 = spark.createDataFrame(base * 5, "g string, v bigint").repartition(7)
    e1 = sketches.hll_distinct(df1, ["g"], F.col("v")).collect()[0].approx_distinct
    e2 = sketches.hll_distinct(df2, ["g"], F.col("v")).collect()[0].approx_distinct
    assert e1 == e2  # registers saturate identically: duplicates are free


def test_histogram_quantiles_within_bin_resolution(spark):
    # uniform 0..999: exact quantiles known; resolution = range/n_bins
    rows = [("g", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.quantile: r.value_est
        for r in sketches.histogram_quantiles(
            df, ["g"], F.col("v"), [0.5, 0.9, 0.99], n_bins=100
        ).collect()
    }
    resolution = 999.0 / 100
    for q in (0.5, 0.9, 0.99):
        assert abs(got[q] - q * 999.0) <= resolution + 1e-9, (q, got[q])


def test_histogram_quantiles_ignores_nulls_and_handles_groups(spark):
    rows = [("a", float(i)) for i in range(100)] + [("b", 5.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sketches.histogram_quantiles(df, ["g"], F.col("v"), [0.5]).collect()
    by_g = {r.g: r.value_est for r in got}
    assert by_g["b"] == 5.0  # degenerate single-value group: lo == hi
    assert 40.0 <= by_g["a"] <= 60.0
