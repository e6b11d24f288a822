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


def test_hll_union_merge_is_lossless(spark):
    """Set-algebra invariant: per-bucket MAX over two days' register
    files yields EXACTLY the register file (and thus the estimate) of
    sketching the concatenated days — the property that lets daily
    sketches answer any date range without re-scanning."""
    from pyspark.sql import functions as F

    from olist_data_warehouse_spark.operators import sketches
    from olist_data_warehouse_spark.sources.readers import load_testdata

    e = load_testdata(spark, "/root/testdata/sf0.001", ("events",))[
        "events"
    ]
    two = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).filter(F.col("day").isin("2024-01-05", "2024-01-06"))

    merged = (
        sketches.hll_registers(two, ["day"], F.col("user_id"))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    direct = sketches.hll_registers(
        two.drop("day"), [], F.col("user_id")
    )
    m = {r.bucket: r.register for r in merged.collect()}
    d = {r.bucket: r.register for r in direct.collect()}
    assert m == d

    est_m = sketches.hll_estimate(merged, []).collect()[0]
    est_d = sketches.hll_estimate(direct, []).collect()[0]
    assert est_m.approx_distinct == est_d.approx_distinct


def test_soft_dedup_uniques_always_survive(spark):
    """samp_soft_dedup: docs in singleton clusters (dup_count=1) must
    ALWAYS be kept (x % 1 == 0), and every kept flag is 0/1."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    df = REGISTRY["samp_soft_dedup"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert all(r.kept in (0, 1) for r in rows)
    uniques = [r for r in rows if r.dup_count == 1]
    assert uniques and all(r.kept == 1 for r in uniques)
    # duplicate clusters: expected ~1 kept per cluster, never negative
    dup_rows = [r for r in rows if r.dup_count > 1]
    assert dup_rows  # injected duplicates exist


def test_approx_percentile_bridges_exact_within_bound(spark):
    """The docstrings of a13/dq_winsorize name approx_percentile as the
    at-scale swap for the exact rank pass; pin that the swap is sound:
    with accuracy 10000 the approximate p50/p99 of order cents sit
    within 1% relative error of the exact order statistics."""
    from olist_data_warehouse_spark.sources.readers import load_testdata
    from pyspark.sql import functions as F

    o = load_testdata(spark, "/root/testdata/sf0.01", ("orders",))["orders"]
    cents = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    )
    approx = cents.agg(
        F.percentile_approx("c", [0.5, 0.99], 10000).alias("p")
    ).head()["p"]
    exact = cents.agg(
        F.expr("percentile(c, array(0.5, 0.99))").alias("p")
    ).head()["p"]
    for a, e in zip(approx, exact):
        assert abs(a - e) / e < 0.01, (a, e)
