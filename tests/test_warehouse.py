"""E2 parity tests: the full DW build on hand-computed Olist fixtures.

Every expected value below is derived by hand from the fixture rows,
mirroring the reference's manual-inspection methodology (SURVEY.md §5)
but mechanized.
"""

from __future__ import annotations

import pytest

from olist_data_warehouse_spark.plans import warehouse
from tests import olist_fixtures


@pytest.fixture(scope="module")
def dw(spark):
    return warehouse.build_warehouse(olist_fixtures.staging(spark))


def rows(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_product_dim_two_phase(dw):
    """Header row filtered; keys from 1000; segment append continues the
    sequence and skips existing products (Olist DW.sql:55-75)."""
    got = rows(dw["product"], "product_key", "product")
    assert got == {
        (1000, "housewares"),  # phase 1, alphabetical
        (1001, "toys"),
        (1002, "pet_shop"),    # phase 2: 'toys' overlap skipped by NOT-IN
    }


def test_location_dim_distinct_and_keys(dw):
    got = rows(dw["location"], "location_key", "city", "state", "zip")
    assert got == {
        (1, "city_a", "SP", "01001"),  # duplicate geolocation collapsed
        (2, "city_b", "RJ", "02002"),
        (3, "city_c", "MG", "03003"),
    }


def test_marketing_dims_keep_nulls(dw):
    """DISTINCT at dim build includes NULL (Olist DW.sql:119-131);
    null/unknown filtering happens later, in the fact (:179)."""
    assert rows(dw["origin"], "origin_key", "origin") == {
        (1, None), (2, "organic_search"), (3, "paid_search"), (4, "unknown"),
    }
    assert rows(dw["lead_type"], "lead_type_key", "lead_type") == {
        (1, None), (2, "online_big"), (3, "online_medium"),
    }
    assert rows(dw["business_type"], "business_type_key", "business_type") == {
        (1, None), (2, "reseller"),
    }


def test_orders_fact_grain_and_measures(dw):
    """Canceled and ≥2019 orders excluded; SUM/COUNT at the fact grain
    (Olist DW.sql:144-156)."""
    got = rows(
        dw["orders"],
        "date_key", "location_key", "product_key", "seller_id",
        "sales_total", "sales_quantity",
    )
    assert got == {
        # o1-p1 (10.0) + o2-p1 (30.0): toys(1001) via s1 @ city_a
        (20180510, 1, 1001, "s1", 40.0, 2),
        # o1-p2 (20.0): housewares(1000) via s2 @ city_b
        (20180510, 2, 1000, "s2", 20.0, 1),
    }


def test_conversions_fact_fanout_filters_and_cleanup(dw):
    """origin null/unknown filtered (:179); order_items fan-out kept
    (§7.4.5); integer AVG; sub-hour row removed by the `< 1` DELETE
    (:183-184)."""
    got = rows(
        dw["conversions"],
        "date_key", "product_key", "origin_key", "lead_type_key",
        "business_type_key", "avg_hrs_convert",
    )
    # Only mql1 survives: organic_search(2), toys(1001),
    # online_medium(3), reseller(2); won 2018-04-03; 50 boundary-hours,
    # fanned out 3× by s1's items — avg still 50.
    # mql2: NULL origin → row filtered by IS NOT NULL? No: NULL origin
    #   fails `origin IS NOT NULL` → excluded.
    # mql3: 'unknown' → excluded. mql4: avg 0 → cleanup DELETE.
    assert got == {(20180403, 1001, 2, 3, 2, 50)}


def test_paired_oltp_dw_forms_agree(spark, dw):
    """The reference's de-facto correctness test (SURVEY §5.1): the DW
    form of the revenue query must agree with the OLTP form."""
    from pyspark.sql import functions as F

    st = olist_fixtures.staging(spark)
    # OLTP form: 6-way join, 2018 only (Olist DW.sql:239-250)
    oltp = (
        st["orders"]
        .filter(
            (F.col("order_status") != "canceled")
            & (F.year("order_purchase_timestamp") == 2018)
        )
        .join(st["order_items"], "order_id")
        .join(st["products"], "product_id")
        .join(st["category"], "product_category_name")
        .join(st["sellers"], "seller_id")
        .groupBy(
            F.col("seller_id"),
            F.col("seller_state").alias("state"),
            F.col("product_category_name_english").alias("product"),
        )
        .agg(F.round(F.sum("price"), 2).alias("total_revenue"))
    )
    # DW form: fact ⋈ dims (Olist DW.sql:252-261)
    dwq = (
        dw["orders"]
        .join(dw["time_period"], "date_key")
        .filter(F.col("year") == 2018)
        .join(dw["location"], "location_key")
        .join(dw["product"], "product_key")
        .groupBy("seller_id", "state", "product")
        .agg(F.round(F.sum("sales_total"), 2).alias("total_revenue"))
    )
    assert rows(oltp, "seller_id", "state", "product", "total_revenue") == rows(
        dwq, "seller_id", "state", "product", "total_revenue"
    )
