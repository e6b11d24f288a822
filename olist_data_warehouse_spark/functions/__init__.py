"""Scalar-semantics layer: T-SQL-exact functions + surrogate keys."""

from olist_data_warehouse_spark.functions.tsql import (  # noqa: F401
    date_key_to_date,
    date_to_date_key,
    datediff_hours,
    int_avg,
    round2,
)
from olist_data_warehouse_spark.functions.keys import surrogate_key  # noqa: F401
