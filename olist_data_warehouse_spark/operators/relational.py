"""Distributed dense-key assignment (``zip_with_index``).

:func:`..functions.keys.surrogate_key` assigns keys with a GLOBAL
(unpartitioned) ``row_number`` window — correct and cheap for
dimension tables (≤ ~100k rows) but a single-task funnel at fact
scale: every row funnels through one task's sort buffer. This module
is the billion-row alternative its docstring promises: the classic
two-phase per-range-offset pattern, kept DataFrame-native so data
never crosses into Python.

Why not ``repartitionByRange`` + ``spark_partition_id``: Spark's
``RangePartitioner`` seeds its boundary sampling from the RDD id, so
two jobs over the same plan draw DIFFERENT boundaries — a counts job
and a numbering job would silently disagree on which rows sit in
which partition (measured: per-partition counts shift on every
action). Instead the bucket is a pure function of the ROW VALUES:

1. Boundaries: sample the leading order column once (fixed seed),
   pick ``B-1`` evenly spaced split values driver-side.
2. Bucket: ``count(boundaries <= key)`` — computed as one
   ``F.aggregate`` over the literal boundary array, entirely
   JVM-side. Monotone BY CONSTRUCTION for any boundary set:
   ``k1 <= k2 ⟹ {b: b <= k1} ⊆ {b: b <= k2}``, so boundary quality
   affects only balance, never correctness, and every job computes
   the identical bucket for a row.
3. Offsets: per-bucket counts (an O(B)-row aggregate), prefix-sum
   driver-side, broadcast back.
4. Number: ``row_number`` over a window PARTITIONED by bucket — B
   independent parallel sorts, never one global funnel.
   ``key = start + offset[bucket] + (rank in bucket) - 1``.

Determinism contract: keys follow the total order of ``order_by``
(callers pass a unique key, or a unique-ifying suffix — same contract
as ``surrogate_key``), independent of the input's partitioning and of
``num_partitions`` — proven by ``tests/test_relational.py``.

Skew note: rows equal on the LEADING order column always share a
bucket (the bucket function cannot split a tie), so a heavily
repeated leading value concentrates its rows in one task — pass a
higher-cardinality leading column, exactly as you would choose a
range-partitioning key.

Reference parity: the reference's surrogate keys are ``CREATE
SEQUENCE`` + ``NEXT VALUE FOR`` (`Olist DW.sql:55-57,84-131`) over
dimension tables; this is the same dense-integer contract at a scale
the reference never reaches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "_zwi_bkt"
_OFF = "_zwi_off"
_SAMPLES_PER_BUCKET = 100


def _boundaries(df: DataFrame, col: str, n_rows: int, buckets: int) -> list:
    """``buckets - 1`` split values for ``col``, sampled with a fixed
    seed. Quality affects balance only (see module docstring), so a
    cheap sample is enough; NULLs are excluded (they compare into
    bucket 0 via three-valued ``>=``)."""
    if buckets <= 1 or n_rows == 0:
        return []
    frac = min(1.0, (buckets * _SAMPLES_PER_BUCKET) / n_rows)
    vals = [
        r[0]
        for r in df.select(col)
        .where(F.col(col).isNotNull())
        .sample(fraction=frac, seed=42)
        .collect()
        if r[0] == r[0]  # drop float NaN: unsortable driver-side
    ]
    if not vals:
        return []
    vals.sort()
    step = len(vals) / buckets
    picks = [vals[int(step * i)] for i in range(1, buckets)]
    out: list = []
    for p in picks:  # dedupe, preserving order
        if not out or p != out[-1]:
            out.append(p)
    return out


def zip_with_index(
    df: DataFrame,
    key_name: str,
    order_by: list[str],
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign ``key_name`` = start, start+1, … densely in ``order_by``
    order, without a global single-task window.

    ``order_by`` should be a unique key (or made unique by its
    suffix): ties would make the assignment among tied rows
    nondeterministic, exactly as with ``surrogate_key``.

    Cost at scale: one sample job + one O(B)-row counts job (both
    column-pruned scans), then ONE shuffle of the data (hash on
    bucket) with B parallel in-bucket sorts. Nothing is persisted or
    checkpointed, and no Python row crossings. Pass
    ``start=max_existing + 1`` to continue a sequence for appends
    (`Olist DW.sql:71-75` semantics).
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    for c in (_BKT, _OFF):
        if c in df.columns:
            raise ValueError(f"input already has a {c} column")
    spark = df.sparkSession
    okeys = [F.col(c).asc_nulls_first() for c in order_by]
    n_buckets = (
        num_partitions or spark.sparkContext.defaultParallelism
    )
    n_rows = df.count()
    if n_rows == 0:
        return df.withColumn(key_name, F.lit(None).cast("long"))
    bnds = _boundaries(df, order_by[0], n_rows, n_buckets)
    if bnds:
        lead = F.col(order_by[0])
        bucket = F.aggregate(
            F.array(*[F.lit(b) for b in bnds]),
            F.lit(0),
            # NULL key: (NULL >= b) is NULL -> otherwise(0) -> bucket
            # 0, matching asc_nulls_first
            lambda acc, b: acc + F.when(lead >= b, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn(_BKT, bucket)
    counts = sorted(
        bucketed.groupBy(_BKT).count().collect(), key=lambda r: r[_BKT]
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r[_BKT], acc))
        acc += r["count"]
    off_df = F.broadcast(
        spark.createDataFrame(offsets, f"{_BKT} int, {_OFF} long")
    )
    w = Window.partitionBy(_BKT).orderBy(*okeys)
    return (
        bucketed.join(off_df, _BKT)
        .withColumn(
            key_name,
            (
                F.row_number().over(w) + F.col(_OFF) + F.lit(start - 1)
            ).cast("long"),
        )
        .drop(_BKT, _OFF)
    )
