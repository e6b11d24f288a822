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


def observe_quality(
    df: DataFrame,
    name: str = "dq",
    key_cols: Sequence[str] = (),
    money_cols: Sequence[str] = (),
):
    """Piggyback data-quality counters on a production job's OWN scan
    via ``df.observe`` — zero extra pass, zero extra shuffle: the
    metrics accumulate on executors while the job computes whatever it
    was going to compute, and surface on the returned ``Observation``
    after the job's action runs.

    This is the operational complement of :func:`profile`: profile is
    a dedicated validation scan you run on an untrusted feed;
    observe_quality is the always-on guardrail a pipeline attaches to
    every load so row counts and null-key counts are recorded for
    free. (In Structured Streaming the same ``observe`` call surfaces
    per-batch via QueryListener — one API, both modes.)

    Returns (observed_df, observation). Use the observed_df in place
    of df; read observation.get after the first action.
    """
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for k in key_cols:
        metrics.append(
            F.count(F.when(F.col(k).isNull(), 1)).alias(f"null_{k}")
        )
    for m in money_cols:
        metrics.append(F.sum(cents(m)).alias(f"sum_{m}_cents"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
