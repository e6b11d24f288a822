"""The Olist warehouse build: the reference's E2 pipeline, Spark-first.

Reproduces the full DW build script (`Olist DW.sql:39-186`) as a DAG of
pure DataFrame functions over the Olist-shaped staging tables
(FIXTURES.md §A). Statement boundaries in the script become function
boundaries here; the cross-statement SEQUENCE state becomes the
max-key-offset rule (SURVEY.md §1.4).

Semantic fidelity notes (each a documented reference behavior):
- product is built in TWO phases: category english names (keys from
  1000, header-row filter) then closed-deal business segments NOT
  already present (keys continue the sequence) — `Olist DW.sql:55-75`.
- origin/lead_type/business_type dims take DISTINCT *including NULL*
  (no filter at dim-build time; NULL rows get keys) — `:119-131`.
  The null/unknown filtering happens later, in the conversions fact
  (`:179`).
- conversions joins order_items via seller, fanning out leads by their
  item count before AVG — looks like a bug, is replicated faithfully
  (SURVEY.md §7.4.5) — `:173`.
- the `avg_hrs_convert < 1` cleanup DELETE (`:183-184`) is applied as
  a post-filter by the caller via ``delete_where`` or the returned
  frame's filter — kept separate so tests can observe both states.

Scale: all dims are tiny → broadcast everywhere; the facts shuffle
once on their grain. Surrogate windows run on dim-sized inputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olist_data_warehouse_spark.functions import (
    date_key_to_date,
    datediff_hours,
    int_avg,
    surrogate_key,
)

HEADER_ROW_LITERAL = "Product_category_name_english"


def build_product_dim(category: DataFrame, closed_deals: DataFrame) -> DataFrame:
    """product(product_key from 1000, product) — `Olist DW.sql:55-75`.

    Phase 1: category english names, filtering the header row that
    slipped into the import (`:67`). Phase 2: distinct non-null
    business segments NOT IN the phase-1 products (NOT-IN ≡ left_anti
    because NULLs are pre-filtered — SURVEY.md §7.4.4), keys continuing
    the sequence (`:71-75`).
    """
    phase1 = surrogate_key(
        category.filter(
            F.col("product_category_name_english") != HEADER_ROW_LITERAL
        ).select(F.col("product_category_name_english").alias("product")),
        "product_key",
        ["product"],
        start=1000,
    ).select("product_key", "product")

    n1 = phase1.count()
    segments = (
        closed_deals.filter(F.col("business_segment").isNotNull())
        .select(F.col("business_segment").alias("product"))
        .distinct()
        .join(phase1.select("product"), "product", "left_anti")
    )
    phase2 = surrogate_key(
        segments, "product_key", ["product"], start=1000 + n1
    ).select("product_key", "product")
    return phase1.unionByName(phase2)


def build_location_dim(geolocation: DataFrame) -> DataFrame:
    """location(location_key from 1, city, state, zip) — `Olist DW.sql:84-97`."""
    base = geolocation.select(
        F.col("geolocation_city").alias("city"),
        F.col("geolocation_state").alias("state"),
        F.col("geolocation_zip_code_prefix").alias("zip"),
    ).distinct()
    return surrogate_key(base, "location_key", ["city", "state", "zip"]).select(
        "location_key", "city", "state", "zip"
    )


def build_origin_dim(leads: DataFrame) -> DataFrame:
    """origin(origin_key from 1, origin) — DISTINCT incl. NULL (`:119-121`)."""
    base = leads.select("origin").distinct()
    return surrogate_key(base, "origin_key", ["origin"]).select(
        "origin_key", "origin"
    )


def build_lead_type_dim(closed_deals: DataFrame) -> DataFrame:
    """lead_type(lead_type_key from 1, lead_type) — `:124-126`."""
    base = closed_deals.select("lead_type").distinct()
    return surrogate_key(base, "lead_type_key", ["lead_type"]).select(
        "lead_type_key", "lead_type"
    )


def build_business_type_dim(closed_deals: DataFrame) -> DataFrame:
    """business_type(business_type_key from 1, business_type) — `:129-131`."""
    base = closed_deals.select("business_type").distinct()
    return surrogate_key(base, "business_type_key", ["business_type"]).select(
        "business_type_key", "business_type"
    )


def build_time_period(start: str = "2016-01-01", end: str = "2019-12-31") -> DataFrame:
    """time_period(date_key int yyyyMMdd, year) — the date dimension the
    reference presumes pre-existing (`Olist DW.sql:153,223`; FIXTURES §A)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast("date"), F.lit(end).cast("date")
                )
            ).alias("d")
        )
        .select(
            F.date_format("d", "yyyyMMdd").cast("int").alias("date_key"),
            F.year("d").cast("int").alias("year"),
        )
    )


def build_orders_fact(
    orders: DataFrame,
    order_items: DataFrame,
    products: DataFrame,
    category: DataFrame,
    sellers: DataFrame,
    product_dim: DataFrame,
    location_dim: DataFrame,
    time_period: DataFrame,
    cutoff: str = "2019-01-01",
) -> DataFrame:
    """orders fact at (date_key, location_key, product_key, seller_id)
    grain — the 8-table star build `Olist DW.sql:144-156`.

    J1 chained equi-joins; J2 expression join (yyyyMMdd int ↔ purchase
    timestamp, precomputed to stay equi/broadcastable); J3 composite
    (zip AND city) join; P3 status filter; P6 date bound; A1 SUM/COUNT.
    """
    o = orders.filter(
        (F.col("order_status") != "canceled")
        & (F.col("order_purchase_timestamp") < F.lit(cutoff).cast("timestamp"))
    )
    joined = (
        o.join(order_items, "order_id")
        .join(F.broadcast(products), "product_id")
        .join(F.broadcast(category), "product_category_name")
        .join(
            F.broadcast(product_dim),
            F.col("product") == F.col("product_category_name_english"),
        )
        .join(F.broadcast(sellers), "seller_id")
        .join(
            F.broadcast(time_period),
            date_key_to_date(F.col("date_key"))
            == F.to_date("order_purchase_timestamp"),
        )
        .join(
            F.broadcast(location_dim),
            (F.col("zip") == F.col("seller_zip_code_prefix"))
            & (F.col("city") == F.col("seller_city")),
        )
    )
    return joined.groupBy(
        "date_key", "location_key", "product_key", "seller_id"
    ).agg(
        F.sum("price").alias("sales_total"),
        # i4 per Package.dtsx:566
        F.count("product_id").cast("int").alias("sales_quantity"),
    )


def build_conversions_fact(
    leads: DataFrame,
    closed_deals: DataFrame,
    sellers: DataFrame,
    order_items: DataFrame,
    product_dim: DataFrame,
    origin_dim: DataFrame,
    lead_type_dim: DataFrame,
    business_type_dim: DataFrame,
    time_period: DataFrame,
) -> DataFrame:
    """conversions fact — the 9-table marketing join `Olist DW.sql:166-180`.

    Faithful quirks: the order_items⋈sellers fan-out inflates AVG
    weighting (`:173`, SURVEY §7.4.5 — do NOT dedupe); origin
    null/unknown filtered HERE, not at dim build (`:179`); integer-AVG
    convention for avg_hrs_convert (§7.4.3). The reference's
    `avg_hrs_convert < 1` DELETE (`:183-184`) is the caller's step.
    """
    joined = (
        leads.join(closed_deals, "mql_id")
        .join(F.broadcast(sellers), "seller_id")
        .join(order_items, "seller_id")
        .join(
            F.broadcast(time_period),
            date_key_to_date(F.col("date_key")) == F.to_date("won_date"),
        )
        .join(
            F.broadcast(product_dim),
            F.col("product") == F.col("business_segment"),
        )
        .join(F.broadcast(origin_dim), "origin")
        .join(F.broadcast(lead_type_dim), "lead_type")
        .join(F.broadcast(business_type_dim), "business_type")
        .filter(F.col("origin").isNotNull() & (F.col("origin") != "unknown"))
    )
    return joined.groupBy(
        "date_key", "product_key", "origin_key", "lead_type_key",
        "business_type_key",
    ).agg(
        int_avg(datediff_hours("first_contact_date", "won_date")).alias(
            "avg_hrs_convert"
        )
    )


def build_warehouse(staging: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Run the full E2 DAG over staging tables; return all DW tables.

    Mirrors the script's dependency order: category→product,
    closed_deals→product append, geolocation→location, leads/closed_
    deals→marketing dims, then both facts, then the cleanup delete.
    """
    product = build_product_dim(staging["category"], staging["closed_deals"])
    location = build_location_dim(staging["geolocation"])
    origin = build_origin_dim(staging["leads"])
    lead_type = build_lead_type_dim(staging["closed_deals"])
    business_type = build_business_type_dim(staging["closed_deals"])
    time_period = staging.get("time_period")
    if time_period is None:
        time_period = build_time_period()

    orders_fact = build_orders_fact(
        staging["orders"], staging["order_items"], staging["products"],
        staging["category"], staging["sellers"], product, location, time_period,
    )
    conversions = build_conversions_fact(
        staging["leads"], staging["closed_deals"], staging["sellers"],
        staging["order_items"], product, origin, lead_type, business_type,
        time_period,
    ).filter(F.col("avg_hrs_convert") >= 1)  # the `:183-184` cleanup DELETE

    return {
        "product": product,
        "location": location,
        "origin": origin,
        "lead_type": lead_type,
        "business_type": business_type,
        "time_period": time_period,
        "orders": orders_fact,
        "conversions": conversions,
    }
