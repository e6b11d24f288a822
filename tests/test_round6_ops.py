"""Round-6 operator gates.

a13_approx_percentile_cert pins a CERTIFICATE (the GK sketch's
rank-error contract holds), not the approx values themselves — so its
oracle is a constant-verdict pin and the real checking power lives
here: the bracket predicate must accept exactly the guarantee window
(negative controls), and the end-to-end entry must certify on real
data while agreeing with the exact a13 groups.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from olist_data_warehouse_spark.plans.queries import (
    REGISTRY,
    _rank_in_bound,
)

SF = "/root/testdata/sf0.001"


def _bound(spark, lt, le, num, den, n, slack):
    df = spark.range(1).select(
        _rank_in_bound(
            F.lit(lt), F.lit(le), num, den, F.lit(n), F.lit(slack)
        ).alias("ok")
    )
    return df.collect()[0]["ok"]


def test_rank_in_bound_accepts_exact_and_slack_window(spark):
    # n=100, median target rank 50. A value occupying exactly rank 50
    # (49 strictly below, 50 at-or-below) passes with zero-slack...
    assert _bound(spark, 49, 50, 1, 2, 100, 0) == 1
    # ...and a value 1 rank off passes only once slack covers it.
    assert _bound(spark, 50, 51, 1, 2, 100, 0) == 0
    assert _bound(spark, 50, 51, 1, 2, 100, 1) == 1
    assert _bound(spark, 47, 48, 1, 2, 100, 1) == 0
    assert _bound(spark, 47, 48, 1, 2, 100, 2) == 1


def test_rank_in_bound_rejects_gross_violation(spark):
    # A "median" that is really the p10 value: lt=9, le=10 vs target 50
    # must fail even with the registered slack (n div 10000 + 1 = 1).
    assert _bound(spark, 9, 10, 1, 2, 100, 1) == 0
    # Same on the p90 side: a p50 value offered as p90 (target rank
    # 9*100/10 = 90).
    assert _bound(spark, 49, 50, 9, 10, 100, 1) == 0


def test_rank_in_bound_handles_heavy_ties(spark):
    # A point mass: every row the same value (lt=0, le=n) brackets any
    # quantile — the wide [lt+1, le] interval is the correct answer,
    # not a false reject.
    assert _bound(spark, 0, 100, 1, 2, 100, 0) == 1
    assert _bound(spark, 0, 100, 9, 10, 100, 0) == 1


def test_cert_entry_certifies_on_testdata(spark):
    got = (
        REGISTRY["a13_approx_percentile_cert"].fn(spark, SF).collect()
    )
    assert len(got) == 3  # A / N / R return flags
    for r in got:
        assert r["med_in_bound"] == 1, r
        assert r["p90_in_bound"] == 1, r
        assert r["n"] > 0
    # Group counts agree with the exact-percentile twin's.
    exact = {
        r["l_returnflag"]: r["n"]
        for r in REGISTRY["a13_median_percentile"].fn(spark, SF).collect()
    }
    assert {r["l_returnflag"]: r["n"] for r in got} == exact
