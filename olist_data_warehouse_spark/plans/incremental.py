"""Incremental load: the SSIS package (E3) as one Spark plan.

The reference's daily delta load is a 4-component SSIS dataflow
(`Package.dtsx:657-673`): OLE DB Source re-runs the fact aggregation
(`:471-482`, same as the build query minus the date upper bound),
Lookup probes a full cache of already-loaded date_keys (left join,
`:124-280`), Conditional Split routes ISNULL(date_key) rows to the
fast-load Destination (`:34-122`, `:281-445`); the UPDATE branch is
unwired, so granularity is whole dates — a late item for an
already-loaded date is dropped (SURVEY.md §7.4.8, replicated).

Spark form: the full-cache Lookup IS a broadcast hash join, and
Lookup + Split + Insert collapse to one ``left_anti`` + append. The
3-process SSIS topology becomes a single lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olist_data_warehouse_spark.plans import warehouse


def build_orders_delta(
    orders: DataFrame,
    order_items: DataFrame,
    products: DataFrame,
    category: DataFrame,
    sellers: DataFrame,
    product_dim: DataFrame,
    location_dim: DataFrame,
    time_period: DataFrame,
) -> DataFrame:
    """The source query (`Package.dtsx:471-482`): the fact aggregation
    WITHOUT the `< '20190101'` bound — new dates flow through."""
    return warehouse.build_orders_fact(
        orders, order_items, products, category, sellers,
        product_dim, location_dim, time_period,
        cutoff="9999-12-31",
    )


def incremental_new_rows(delta: DataFrame, dw_orders: DataFrame) -> DataFrame:
    """Lookup + Split: keep only rows whose date_key is absent from the
    warehouse. Broadcast the (small, distinct) loaded-keys set — the
    Spark twin of the SSIS full-cache Lookup (`Package.dtsx:154`)."""
    loaded = dw_orders.select("date_key").distinct()
    return delta.join(F.broadcast(loaded), "date_key", "left_anti")


def incremental_load_orders(
    staging: dict[str, DataFrame],
    dw: dict[str, DataFrame],
) -> DataFrame:
    """Full E3 pipeline against in-memory tables; returns the rows the
    Destination would fast-load (caller appends them — one atomic
    commit, matching MaxInsertCommitSize=2147483647 single-commit)."""
    delta = build_orders_delta(
        staging["orders"], staging["order_items"], staging["products"],
        staging["category"], staging["sellers"],
        dw["product"], dw["location"], dw["time_period"],
    )
    return incremental_new_rows(delta, dw["orders"])
