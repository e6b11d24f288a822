"""Slowly-changing-dimension (Type 2) maintenance.

The reference rebuilds its dimensions from scratch on every load
(`Olist DW.sql:55-131`) — history is lost when a seller moves state or
a product is recategorized. `scd2_apply` upgrades that to the standard
effective-dated merge: attribute changes CLOSE the open row
(effective_to = batch date) and INSERT a new open row, so fact rows
joined on (key, date in [from, to)) see the attributes that were true
at transaction time.

Plan shape: one full-outer shuffle join between the dimension's open
rows and the update snapshot, classified row-by-row with null-safe
attribute comparison; history rows pass through untouched. Dimensions
are dim-sized by definition (≤ ~10⁶ rows at the reference's scale), so
this is never the bottleneck next to a fact build; at larger dim
cardinality the join keys are already the shuffle keys, nothing
collects to the driver.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_ts: Column,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Merge an update snapshot into a Type-2 dimension.

    ``dim`` rows carry ``tracked_cols`` plus the three SCD bookkeeping
    columns; ``updates`` carries (key_cols, tracked_cols) as of
    ``batch_ts``. Returns the full new dimension state:

    - closed history rows: untouched;
    - open rows whose key is absent from the snapshot, or whose
      tracked attributes are unchanged (null-safe compare): untouched;
    - changed keys: the open row is closed at ``batch_ts`` and a new
      open row with the snapshot attributes is inserted;
    - brand-new keys: inserted as open rows.
    """
    open_rows = dim.filter(F.col(is_current))
    closed_rows = dim.filter(~F.col(is_current))

    d = open_rows.select(
        *key_cols,
        *[F.col(c).alias(f"_d_{c}") for c in tracked_cols],
        F.col(effective_from).alias("_d_from"),
    ).withColumn("_in_d", F.lit(True))
    u = updates.select(
        *key_cols, *[F.col(c).alias(f"_u_{c}") for c in tracked_cols]
    ).withColumn("_in_u", F.lit(True))

    j = d.join(u, key_cols, "full_outer")
    changed = functools.reduce(
        operator.or_,
        [~F.col(f"_d_{c}").eqNullSafe(F.col(f"_u_{c}")) for c in tracked_cols],
    )
    in_both = F.coalesce("_in_d", F.lit(False)) & F.coalesce("_in_u", F.lit(False))

    ts_type = dim.schema[effective_from].dataType

    def row(from_col, to_col, cur, cols_prefix):
        return [
            *key_cols,
            *[F.col(f"{cols_prefix}{c}").alias(c) for c in tracked_cols],
            from_col.cast(ts_type).alias(effective_from),
            to_col.cast(ts_type).alias(effective_to),
            cur.alias(is_current),
        ]

    # open rows that survive as-is (unchanged, or key absent from batch)
    survive = j.filter(
        F.coalesce("_in_d", F.lit(False)) & ~(in_both & changed)
    ).select(*row(F.col("_d_from"), F.lit(None), F.lit(True), "_d_"))
    # changed keys: close the old row ...
    closed_now = j.filter(in_both & changed).select(
        *row(F.col("_d_from"), batch_ts, F.lit(False), "_d_")
    )
    # ... and insert the new version; brand-new keys insert too
    inserted = j.filter(
        F.coalesce("_in_u", F.lit(False)) & (~F.coalesce("_in_d", F.lit(False)) | changed)
    ).select(*row(batch_ts, F.lit(None), F.lit(True), "_u_"))

    return (
        closed_rows.select(
            *key_cols, *tracked_cols, effective_from, effective_to, is_current
        )
        .unionByName(survive)
        .unionByName(closed_now)
        .unionByName(inserted)
    )
