"""Explicit StructTypes for every table the engine touches.

The reference declares schemas implicitly via ``SELECT INTO`` inference
(schema-on-write CTAS; `Olist DW.sql:64-180`) with physical types pinned
by the SSIS metadata (`Package.dtsx:519-601`). We make that explicit:
never rely on CSV/JSON inference inside the engine.

Two families:
- OLIST_*: the reference's staging tables (FIXTURES.md §A) and the
  warehouse tables it builds (§B). Money stays DoubleType because the
  reference stores it as r8/FLOAT (`Package.dtsx:557`) — deliberately
  not "fixed" to Decimal so differential results match.
- TESTDATA_*: the driver's TPC-H-ish parquet tables (TESTDATA.md),
  used by the query registry.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# --- Olist staging (reference inputs; Olist DW.sql:8-22) -------------------

OLIST_ORDERS = _s(
    ("order_id", T.StringType()),
    ("customer_id", T.StringType()),
    ("order_status", T.StringType()),
    ("order_purchase_timestamp", T.TimestampType()),
    ("order_approved_at", T.TimestampType()),
    ("order_delivered_carrier_date", T.TimestampType()),
    ("order_delivered_customer_date", T.TimestampType()),
    ("order_estimated_delivery_date", T.TimestampType()),
)

OLIST_ORDER_ITEMS = _s(
    ("order_id", T.StringType()),
    ("order_item_id", T.IntegerType()),
    ("product_id", T.StringType()),
    ("seller_id", T.StringType()),
    ("shipping_limit_date", T.TimestampType()),
    ("price", T.DoubleType()),
    ("freight_value", T.DoubleType()),
)

OLIST_PRODUCTS = _s(
    ("product_id", T.StringType()),
    ("product_category_name", T.StringType()),
)

OLIST_CATEGORY = _s(
    ("product_category_name", T.StringType()),
    ("product_category_name_english", T.StringType()),
)

OLIST_SELLERS = _s(
    ("seller_id", T.StringType()),
    ("seller_zip_code_prefix", T.StringType()),
    ("seller_city", T.StringType()),
    ("seller_state", T.StringType()),
)

OLIST_GEOLOCATION = _s(
    ("geolocation_zip_code_prefix", T.StringType()),
    ("geolocation_city", T.StringType()),
    ("geolocation_state", T.StringType()),
)

OLIST_LEADS = _s(
    ("mql_id", T.StringType()),
    ("first_contact_date", T.TimestampType()),
    ("origin", T.StringType()),
)

OLIST_CLOSED_DEALS = _s(
    ("mql_id", T.StringType()),
    ("seller_id", T.StringType()),
    ("business_segment", T.StringType()),
    ("lead_type", T.StringType()),
    ("business_type", T.StringType()),
    ("won_date", T.TimestampType()),
)

OLIST_TIME_PERIOD = _s(
    ("date_key", T.IntegerType()),
    ("year", T.IntegerType()),
)

# --- Olist warehouse outputs (reference builds; FIXTURES.md §B) ------------

DW_PRODUCT = _s(("product_key", T.LongType()), ("product", T.StringType()))
DW_LOCATION = _s(
    ("location_key", T.LongType()),
    ("city", T.StringType()),
    ("state", T.StringType()),
    ("zip", T.StringType()),
)
DW_ORIGIN = _s(("origin_key", T.LongType()), ("origin", T.StringType()))
DW_LEAD_TYPE = _s(("lead_type_key", T.LongType()), ("lead_type", T.StringType()))
DW_BUSINESS_TYPE = _s(
    ("business_type_key", T.LongType()), ("business_type", T.StringType())
)
# Fact types pinned by Package.dtsx:519-601 (i4/i8/wstr(50)/r8).
DW_ORDERS_FACT = _s(
    ("date_key", T.IntegerType()),
    ("location_key", T.LongType()),
    ("product_key", T.LongType()),
    ("seller_id", T.StringType()),
    ("sales_total", T.DoubleType()),
    ("sales_quantity", T.IntegerType()),
)
DW_CONVERSIONS_FACT = _s(
    ("date_key", T.IntegerType()),
    ("product_key", T.LongType()),
    ("origin_key", T.LongType()),
    ("lead_type_key", T.LongType()),
    ("business_type_key", T.LongType()),
    ("avg_hrs_convert", T.LongType()),
)

# --- Driver testdata (TESTDATA.md / FIXTURES.md §D) ------------------------

TESTDATA = {
    "region": _s(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _s(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _s(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _s(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _s(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _s(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}
