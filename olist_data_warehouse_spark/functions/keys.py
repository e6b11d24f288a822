"""Deterministic surrogate-key generation (SEQUENCE emulation).

The reference assigns dimension keys with ``CREATE SEQUENCE`` +
``NEXT VALUE FOR`` (`Olist DW.sql:55-57,64,72,84-131`): monotonically
increasing integers, ``product_key`` seeded at 1000, appends continuing
the sequence across statements.

Spark mapping (SURVEY.md §1.4): ``row_number() OVER (ORDER BY natural
key) + offset`` — deterministic and stable across runs, unlike
``monotonically_increasing_id()`` (partition-dependent). For appends
that must continue a sequence, offset = current MAX(key).

Scale note: a global (unpartitioned) row_number window funnels through
a single task. That is correct *and cheap* here because surrogate keys
are only ever assigned to dimension tables (max ~27k rows in the
reference; dims are small by definition of a star schema). Fact tables
never get surrogate keys — they carry dimension FKs. For a
billion-row key assignment switch to the two-phase
per-partition-offset pattern in
:func:`olist_data_warehouse_spark.operators.relational.zip_with_index`
— same dense-integer contract, no single-task funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_key(
    df: DataFrame,
    key_name: str,
    order_by: list[str],
    start: int = 1,
) -> DataFrame:
    """Assign ``key_name`` = start, start+1, ... in ``order_by`` order.

    ``start`` mirrors sequence seeding (product starts at 1000 —
    `Olist DW.sql:56`); pass ``start=max_existing + 1`` to continue an
    existing sequence for appends (`Olist DW.sql:71-75`).
    """
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in order_by])
    return df.withColumn(
        key_name, (F.row_number().over(w) + F.lit(start - 1)).cast("long")
    )
