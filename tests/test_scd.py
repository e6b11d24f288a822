"""SCD Type-2 merge semantics on hand-built rows: every row class
(history passthrough, unchanged, changed, absent, brand-new) plus the
null-safe attribute comparison."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import scd

DIM_SCHEMA = (
    "k bigint, attr string, effective_from date, effective_to date, "
    "is_current boolean"
)


def _apply(spark, dim_rows, upd_rows):
    dim = spark.createDataFrame(dim_rows, DIM_SCHEMA)
    upd = spark.createDataFrame(upd_rows, "k bigint, attr string")
    out = scd.scd2_apply(
        dim, upd, key_cols=["k"], tracked_cols=["attr"],
        batch_ts=F.lit("2024-06-01").cast("date"),
    )
    return sorted(map(tuple, out.collect()), key=repr)


def test_scd2_all_row_classes(spark):
    d0 = date(2020, 1, 1)
    batch = date(2024, 6, 1)
    dim = [
        # closed history row: must pass through untouched
        (1, "old", d0, date(2022, 1, 1), False),
        (1, "cur", date(2022, 1, 1), None, True),   # unchanged in batch
        (2, "x", d0, None, True),                    # changed in batch
        (3, "z", d0, None, True),                    # absent from batch
    ]
    upd = [(1, "cur"), (2, "y"), (4, "new")]
    got = _apply(spark, dim, upd)
    assert got == sorted([
        (1, "old", d0, date(2022, 1, 1), False),          # history kept
        (1, "cur", date(2022, 1, 1), None, True),         # unchanged
        (2, "x", d0, batch, False),                       # closed
        (2, "y", batch, None, True),                      # new version
        (3, "z", d0, None, True),                         # absent → open
        (4, "new", batch, None, True),                    # brand-new key
    ], key=repr)


def test_scd2_null_safe_attribute_compare(spark):
    d0 = date(2020, 1, 1)
    batch = date(2024, 6, 1)
    dim = [
        (1, None, d0, None, True),   # NULL attr, unchanged (NULL → NULL)
        (2, None, d0, None, True),   # NULL → value: must count as changed
        (3, "v", d0, None, True),    # value → NULL: must count as changed
    ]
    upd = [(1, None), (2, "v"), (3, None)]
    got = _apply(spark, dim, upd)
    assert got == sorted([
        (1, None, d0, None, True),
        (2, None, d0, batch, False),
        (2, "v", batch, None, True),
        (3, "v", d0, batch, False),
        (3, None, batch, None, True),
    ], key=repr)


def test_scd2_idempotent_reapply(spark):
    """Re-running the same batch against the merged state is a no-op —
    the property that makes backfills safe."""
    d0 = date(2020, 1, 1)
    dim = [(1, "a", d0, None, True), (2, "b", d0, None, True)]
    upd = [(1, "a2"), (2, "b")]
    once = _apply(spark, dim, upd)
    again = _apply(spark, [tuple(r) for r in once], upd)
    assert sorted(once, key=repr) == sorted(again, key=repr)
