"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``olist_data_warehouse_spark.plans.queries.REGISTRY``:
every implemented operator from SURVEY.md §2 registers a Spark plan and
(where SQL-expressible) a DuckDB oracle twin there; this module just
exposes them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from olist_data_warehouse_spark.plans.queries import REGISTRY, ordered_registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-5 revenue over the star schema (DW form)."""
    return REGISTRY["q2_top_revenue_dw"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, highest-
    evaluation-priority first (the driver checks a bounded prefix)."""
    return {name: rq.fn for name, rq in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: rq.oracle
        for name, rq in ordered_registry().items()
        if rq.oracle is not None
    }
