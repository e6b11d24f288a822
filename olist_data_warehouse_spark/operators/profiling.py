"""Single-pass table profiling — the pre-ingestion validation step.

A feed is trusted only after one cheap scan answers: how many rows, how
complete are the keys, what ranges do the values span, did the checksum
move since yesterday. ``profile`` builds that as ONE aggregate over the
table — counts, distincts, ranges, and integer-cents checksums — so the
cost is a single scan plus Spark's expand-based partial aggregation for
the distinct counts (the shuffle carries distinct keys, not rows).

At 100 TB the exact distinct counts are the only term whose state grows
with cardinality; swap them for the portable HLL sketch
(`operators/sketches.py`) when approximate suffices — the rest of the
profile is constant-size per partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Money column → integer cents (the engine's cross-engine-exact
    representation for sums/checksums; see SCALING.md)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def profile(
    df: DataFrame,
    key_cols: Sequence[str] = (),
    money_cols: Sequence[str] = (),
    ts_cols: Sequence[str] = (),
) -> DataFrame:
    """One-row, one-scan data-quality profile.

    Per key column: non-null and distinct counts. Per money column:
    min/max/sum in integer cents. Per timestamp column: min/max
    rendered ``yyyy-MM-dd HH:mm:ss`` (UTC-pinned sessions make this
    engine-portable). Column names are ``<metric>_<col>``.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_cols:
        aggs.append(F.count(c).alias(f"n_{c}"))
        aggs.append(F.countDistinct(c).alias(f"n_distinct_{c}"))
    for c in money_cols:
        cc = cents(c)
        aggs.append(F.min(cc).alias(f"min_cents_{c}"))
        aggs.append(F.max(cc).alias(f"max_cents_{c}"))
        aggs.append(F.sum(cc).alias(f"sum_cents_{c}"))
    for c in ts_cols:
        aggs.append(
            F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss").alias(f"min_{c}")
        )
        aggs.append(
            F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss").alias(f"max_{c}")
        )
    return df.agg(*aggs)
