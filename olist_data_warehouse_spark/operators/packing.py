"""Sequence packing: concat-and-chunk documents into training windows.

LLM pretraining consumes fixed-length token windows, not documents: the
corpus is laid out as one long token stream (documents in a canonical
order) and sliced every ``ctx`` tokens; each document therefore maps to
the chunk range its token interval overlaps. This operator computes
that mapping — (doc_id, chunk_id, span) — from per-document token
counts alone; the tokens themselves never move.

The hard part at scale is the **global prefix sum**: each document's
stream offset is the total token count of every document before it in
the canonical order. A bare ``Window.orderBy(...)`` computes that on a
single partition — the classic scale cliff. Instead the standard
two-pass distributed prefix sum:

1. hash-bucket documents into ``n_buckets`` groups; canonical order is
   (bucket, doc_id) — an order we are free to *define*, since packing
   only needs determinism, not semantics;
2. per-bucket token totals (tiny agg: one row per bucket), prefix-sum
   those ``n_buckets`` rows on one partition — trivially small;
3. broadcast the bucket offsets back and cumsum *within* each bucket
   (``Window.partitionBy(bucket)``) — every partition bounded at
   ~|corpus|/n_buckets rows.

Chunk assignment is then pure per-row math: document spans
[cum − n, cum) overlap chunks floor(start/ctx) … floor((end−1)/ctx),
exploded with ``sequence()`` — ≤ ⌈n/ctx⌉+1 rows per document.

Everything is Catalyst expressions over (long, long) rows; the oracle
reproduces the identical layout with one window sum ordered by
(bucket, doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olist_data_warehouse_spark.operators.textops import portable_hash32


def concat_chunks(
    docs: DataFrame,
    id_col: str,
    n_tokens: Column,
    ctx: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """(doc_id, chunk_id, tok_start, tok_end, span_len): which training
    windows each document lands in under concat-and-chunk packing.

    ``tok_start``/``tok_end`` are the document's global token-stream
    interval; ``span_len`` is how many of its tokens fall in this
    chunk. Zero-token documents occupy no chunk and are dropped.
    """
    if ctx <= 0:
        raise ValueError("ctx must be positive")
    d = docs.select(
        F.col(id_col).alias("doc_id"), n_tokens.cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    d = d.withColumn(
        "bucket", portable_hash32(F.col("doc_id").cast("string")) % n_buckets
    )
    # Pass 1: per-bucket totals — n_buckets rows, map-side combined.
    totals = d.groupBy("bucket").agg(F.sum("n_tokens").alias("_btot"))
    # Prefix over the bucket totals: single-partition window over
    # n_buckets rows (thousands at most) — deliberately tiny.
    w_prefix = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("_btot").over(w_prefix), F.lit(0)).alias("_boff"),
    )
    # Pass 2: within-bucket cumsum; bucket offsets join as a broadcast.
    w_bucket = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "tok_end", F.col("_boff") + F.sum("n_tokens").over(w_bucket)
        )
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    )
    chunked = d.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.floor(F.col("tok_start") / ctx),
                F.floor((F.col("tok_end") - 1) / ctx),
            )
        ),
    )
    span_start = F.greatest(F.col("tok_start"), F.col("chunk_id") * ctx)
    span_end = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * ctx)
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "tok_start",
        "tok_end",
        (span_end - span_start).cast("long").alias("span_len"),
    )


def sliding_windows(
    docs: DataFrame,
    id_col: str,
    n_tokens: Column,
    win: int = 256,
    stride: int = 128,
) -> DataFrame:
    """(doc_id, win_idx, tok_start, tok_end, win_len): overlapping
    fixed-stride windows *within* each document — the long-document
    segmentation pass (embedding contexts, extraction windows),
    complementary to :func:`concat_chunks` which packs *across*
    documents.

    Windows start every ``stride`` tokens while inside the document;
    the last window truncates at the document end. Pure per-row
    ``sequence``/``explode`` arithmetic — no shuffle, no state, scale-
    free: a document with n tokens yields ⌈n/stride⌉ rows regardless
    of partitioning.
    """
    if win <= 0 or stride <= 0:
        raise ValueError("win and stride must be positive")
    d = docs.select(
        F.col(id_col).alias("doc_id"), n_tokens.cast("long").alias("_n")
    ).filter(F.col("_n") > 0)
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((F.col("_n") - 1) / stride))
    )
    out = d.withColumn("win_idx", idx)
    start = F.col("win_idx") * stride
    end = F.least(start + win, F.col("_n"))
    return out.select(
        "doc_id",
        F.col("win_idx").cast("long").alias("win_idx"),
        start.cast("long").alias("tok_start"),
        end.cast("long").alias("tok_end"),
        (end - start).cast("long").alias("win_len"),
    )


#: Sentinel bands for NULL sort keys (see :func:`banded_global_rank`):
#: far outside any real ``long``-cast band while leaving headroom so
#: arithmetic on the band column cannot overflow.
_NULL_BAND_FIRST = -(2**62)
_NULL_BAND_LAST = 2**62


def _banded(df: DataFrame, band: Column, nulls: str | None) -> DataFrame:
    """Attach the ``_band`` column with the NULL contract applied.

    A NULL band would silently vanish in the equi-join that carries the
    band offsets back (NULL never equi-matches), corrupting the global
    numbering — so NULL is never allowed to pass through implicitly:

    - ``nulls=None`` (default): NULL bands are a contract violation —
      the plan raises at runtime on the first NULL (cheap ``when``
      guard, no extra pass), instead of silently dropping rows.
    - ``nulls="first"`` / ``"last"``: rows with a NULL band are routed
      to a sentinel band that sorts before / after every real band.
      The caller must pin the SAME null position in ``order_by``
      (``asc_nulls_first`` / ``asc_nulls_last`` etc.) and in any
      cross-engine oracle (``NULLS FIRST`` / ``NULLS LAST``).
    """
    b = band.cast("long")
    if nulls is None:
        guarded = F.when(
            b.isNull(),
            F.raise_error(
                F.lit(
                    "banded rank/sum: NULL band (NULL sort key?) — "
                    "filter NULL keys or pass nulls='first'/'last'"
                )
            ).cast("long"),
        ).otherwise(b)
    elif nulls == "first":
        guarded = F.coalesce(b, F.lit(_NULL_BAND_FIRST))
    elif nulls == "last":
        guarded = F.coalesce(b, F.lit(_NULL_BAND_LAST))
    else:
        raise ValueError("nulls must be None, 'first' or 'last'")
    return df.withColumn("_band", guarded)


def banded_global_rank(
    df: DataFrame,
    band: Column,
    order_by: list[Column],
    rank_name: str = "rk",
    nulls: str | None = None,
) -> DataFrame:
    """Exact global ``ROW_NUMBER() OVER (ORDER BY order_by)`` without a
    single-partition window — the two-pass range-banded rank.

    ``band`` must be a coarse, *monotone non-decreasing* function of the
    leading sort key (e.g. ``c div 2**23`` for an ascending key,
    ``-(n div 16)`` for a descending one): banding then merely
    decomposes the same total order, so the result is byte-identical to
    the naive global window. Three steps:

    1. per-band row counts — a tiny map-side-combined agg, one row per
       band (O(key_range / band_width), bounded ≪ O(rows));
    2. prefix-sum those counts ordered by band — a single-partition
       window over the *band* table only;
    3. rank within band (``Window.partitionBy(band)``) + broadcast the
       band offsets back: global rank = offset + local rank.

    Each window partition is bounded by the rows sharing a band, so the
    scan-scale table never sorts on one executor. NULL sort keys are a
    loud contract, never a silent drop — see :func:`_banded` for the
    ``nulls`` parameter (default raises at runtime on a NULL band).
    Skew fuse: a point-mass key distribution (every row the same key)
    collapses to one band — pick the band width from the key's spread,
    or use :func:`range_global_rank`, the distribution-adaptive
    variant that spreads ties across partitions by range-partitioning
    on the FULL (key, tiebreak) order; this banded form keeps band
    boundaries plan-independent and deterministic.
    """
    d = _banded(df, band, nulls)
    counts = d.groupBy("_band").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = Window.orderBy("_band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_band",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_boff"),
    )
    w_local = Window.partitionBy("_band").orderBy(*order_by)
    return (
        d.join(F.broadcast(offsets), "_band")
        .withColumn(
            rank_name, F.col("_boff") + F.row_number().over(w_local)
        )
        .drop("_band", "_boff")
    )


def banded_running_sum(
    df: DataFrame,
    band: Column,
    order_by: list[Column],
    sums: dict[str, str],
    nulls: str | None = None,
) -> DataFrame:
    """Exact global ``SUM(col) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` for one or more columns without a single-partition
    window — the running-sum sibling of :func:`banded_global_rank`
    (same two-pass banded decomposition, same ``band`` monotonicity
    and NULL contract; see there).

    ``sums`` maps output name → input column: each output is the
    inclusive running total of its input in the global ``order_by``
    order. Per-band totals are a tiny map-side-combined agg (one row
    per band); the band table alone takes the single-partition prefix
    window; scan-scale rows only ever see a within-band window. Used
    by the KS-drift CDF, where the naive form sorts the whole value
    domain on one executor.
    """
    d = _banded(df, band, nulls)
    aggs = [F.sum(src).alias(f"_t_{out}") for out, src in sums.items()]
    totals = d.groupBy("_band").agg(*aggs)
    w_off = Window.orderBy("_band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_band",
        *[
            F.coalesce(F.sum(f"_t_{out}").over(w_off), F.lit(0)).alias(
                f"_o_{out}"
            )
            for out in sums
        ],
    )
    w_local = Window.partitionBy("_band").orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = d.join(F.broadcast(offsets), "_band")
    for name, src in sums.items():
        out = out.withColumn(
            name, F.col(f"_o_{name}") + F.sum(src).over(w_local)
        )
    return out.drop("_band", *[f"_o_{n}" for n in sums])


def range_global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_name: str = "rk",
    num_partitions: int = 64,
) -> DataFrame:
    """Exact global ``ROW_NUMBER()`` that adapts to ANY key
    distribution — including the point-mass case that collapses
    :func:`banded_global_rank` to one band.

    ``order_by`` must be a TOTAL order (unique tiebreak column), which
    every ranking caller in this repo already guarantees; with a total
    order, ``repartitionByRange`` on the FULL key list spreads rows
    that tie on the leading key across partitions by their tiebreak,
    so no partition ever holds more than ~rows/num_partitions rows
    regardless of skew. Mechanics (the classic zipWithIndex layout,
    expressed declaratively):

    1. range-partition + sort within partitions on ``order_by``; a
       ``monotonically_increasing_id`` over that sorted layout encodes
       (partition, local ordinal) as ``pid * 2^33 + i`` — no window;
    2. per-partition row counts (num_partitions rows) prefix-summed on
       one partition — trivially small;
    3. global rank = broadcast partition offset + local ordinal + 1.

    Range boundaries come from Spark's deterministic reservoir sample,
    and because the order is total, each row's rank is determined by
    the ORDER alone — identical whatever boundaries the sampler picks,
    and identical across the two DAG branches that recompute the
    layout. ``num_partitions`` is explicit so AQE cannot re-plan the
    two branches to different partitionings. NULL leading keys follow
    the ``order_by`` expressions' own null placement (range
    partitioning keeps Spark's null ordering) — pin ``asc_nulls_*``
    explicitly when NULLs can reach the sort key.
    """
    laid = (
        df.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftrightunsigned(F.col("_mid"), 33)
    local = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    laid = laid.withColumn("_pid", pid).withColumn("_loc", local)
    counts = laid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn"))
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_poff"),
    )
    return (
        laid.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_name, F.col("_poff") + F.col("_loc") + 1)
        .drop("_mid", "_pid", "_loc", "_poff")
    )
