"""Bloom filter and count-min sketch guarantees: no false negatives /
no undercounts — the properties that make them safe as join reducers
and heavy-hitter estimators."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import bloom, sketches


def test_bloom_no_false_negatives_and_bounded_false_positives(spark):
    build = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 2)], "k bigint"   # even keys
    )
    words = bloom.bloom_build(build, F.col("k"))
    probe = spark.createDataFrame([(i,) for i in range(2000)], "k bigint")
    passed = {
        r.k for r in
        probe.filter(bloom.bloom_might_contain(F.col("k"), words)).collect()
    }
    members = set(range(0, 2000, 2))
    assert members <= passed          # every member passes, always
    fp = len(passed - members) / 1000
    # 1000 keys in 65536 bits, k=3 → theoretical fp ~ (1-e^-3000/65536)^3
    assert fp < 0.01, fp


def test_bloom_filter_is_scan_stage_predicate(spark):
    """Membership must evaluate pre-shuffle: a plain Filter over the
    scan, no join/exchange introduced by the probe side."""
    import io
    from contextlib import redirect_stdout

    build = spark.createDataFrame([(1,), (2,)], "k bigint")
    words = bloom.bloom_build(build, F.col("k"))
    probe = spark.createDataFrame([(i,) for i in range(10)], "k bigint")
    df = probe.filter(bloom.bloom_might_contain(F.col("k"), words))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "Exchange" not in plan


def test_cms_never_undercounts_and_is_tight_here(spark):
    rows = [(i % 37,) for i in range(3700)]  # 37 keys x 100 each
    df = spark.createDataFrame(rows, "k bigint")
    cms = sketches.cms_build(df, F.col("k"))
    cand = df.select("k").distinct()
    est = {
        r.key: r.est
        for r in sketches.cms_estimate(cms, cand, F.col("k")).collect()
    }
    assert set(est) == set(range(37))
    for k, e in est.items():
        assert e >= 100            # the CMS guarantee: never undercount
        assert e <= 100 + 3700     # trivially bounded by total mass
    # 37 keys in 4x1024 cells: collisions are rare → estimates exact
    assert sum(1 for e in est.values() if e == 100) >= 35


def test_cms_matrix_is_bounded(spark):
    rows = [(i,) for i in range(50000)]
    df = spark.createDataFrame(rows, "k bigint")
    cms = sketches.cms_build(df, F.col("k"))
    assert cms.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH
