"""Mergeable sketches, engine-portable and deterministic.

Spark's built-in `approx_count_distinct` / `percentile_approx` are
fine on a cluster but useless for cross-engine verification: their
estimates are implementation-specific, so no oracle can check them.
These operators implement the same sketch *algorithms* relationally,
from the portable md5-based hash family — every intermediate is an
integer (or a single IEEE double op), so Spark and DuckDB produce
bit-identical results, and correctness is gated by the same
hash-match oracle as every other operator.

Scale posture (the reason sketches exist at 100 TB):

- **HLL distinct count**: per (group, bucket) max-rank is a partial
  aggregate — map-side combine collapses each partition to ≤ m rows
  per group before the shuffle; the final reduce touches m=64 rows
  per group regardless of input size. That is the whole point of HLL:
  a fixed-size, mergeable register file instead of a distinct-shuffle
  of every value.
- **Histogram quantiles**: one pass for bounds, one groupBy on
  (group, bin) — again a bounded-cardinality partial aggregate — and
  a window over n_bins rows per group. No global sort at any scale,
  unlike exact percentile.

Register math is integer-exact: rank uses bit-length (no float log),
and the harmonic sum is kept scaled by 2^RANK_MAX so it stays a
BIGINT; the only floating ops are the final estimate division and the
small-range-correction ln, identical one-op IEEE on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olist_data_warehouse_spark.operators.textops import portable_hash32

# 64 registers (b=6 index bits), 26-bit rank domain, rank in [1, 27].
HLL_M = 64
HLL_RANK_BITS = 32 - 6          # bits left after the bucket index
HLL_RANK_MAX = HLL_RANK_BITS + 1
HLL_ALPHA = 0.709               # alpha_64 from the HLL paper


def _hll_registers(df: DataFrame, group_cols: list[str], value: Column) -> DataFrame:
    """(group..., bucket, register): the HLL register file. The
    aggregate is max() so Spark computes it map-side; the shuffle
    carries at most m rows per group per partition."""
    h = portable_hash32(value.cast("string"))
    # floor before the long cast: DuckDB's double->BIGINT cast rounds
    # where Spark's truncates, so the oracle twin floors explicitly too
    bucket = F.floor(h / (1 << HLL_RANK_BITS)).cast("long")   # top 6 bits
    w = h % (1 << HLL_RANK_BITS)                              # low 26 bits
    # rank = leading-zero count within the 26-bit word, + 1.
    # bit_length(w) == length(bin(w)) for w > 0 — integer-exact, no log.
    rank = F.when(w == 0, F.lit(HLL_RANK_MAX)).otherwise(
        HLL_RANK_MAX - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_distinct(df: DataFrame, group_cols: list[str], value: Column) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog
    (m=64 → ~13% standard error; raise HLL_M for tighter bounds).

    Returns (group..., approx_distinct double, n_zero_registers long).
    Estimate = alpha·m²/Z with the harmonic sum Z kept as an exact
    scaled BIGINT (sum of 2^(RANK_MAX - register), absent buckets
    contributing 2^RANK_MAX), plus the standard small-range
    correction E = m·ln(m/V) when E ≤ 2.5m and V zero registers
    remain. Deterministic on any engine with the same hash.
    """
    regs = _hll_registers(df, group_cols, value)
    return hll_estimate(regs, group_cols)


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Estimate from a (group..., bucket, register) register file —
    the merge-side half of the sketch: register files from any
    partition of the data combine by per-bucket MAX and re-estimate
    through this same function (used by the set-algebra op to
    estimate a union without re-scanning). Identical math to the
    one-shot path; refactored out so both share one formula."""
    scale = 1 << HLL_RANK_MAX
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2), HLL_RANK_MAX - F.col("register")).cast("long"))
        .alias("sum_occupied"),
        F.count("*").alias("n_occupied"),
    )
    sum_scaled = (
        F.col("sum_occupied") + (HLL_M - F.col("n_occupied")) * F.lit(scale)
    )
    zeros = (HLL_M - F.col("n_occupied")).cast("long")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * scale) / sum_scaled
    corrected = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        F.round(corrected, 4).alias("approx_distinct"),
        zeros.alias("n_zero_registers"),
    )


def hll_registers(df: DataFrame, group_cols: list[str], value: Column) -> DataFrame:
    """Public register-file builder (see _hll_registers)."""
    return _hll_registers(df, group_cols, value)


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    quantiles: list[float],
    n_bins: int = 100,
) -> DataFrame:
    """Approximate quantiles per group from an equi-width histogram:
    one bounds pass, one bounded-cardinality groupBy on (group, bin),
    one window over ≤ n_bins rows per group. Returns the lower edge
    of the first bin whose cumulative count reaches q·n — resolution
    is (max-min)/n_bins, which is the knob. No global sort, unlike
    exact percentile; bit-identical across engines (bin indices are
    floors of one double division).
    """
    df = df.filter(value.isNotNull())  # a NULL value has no bin
    bounds = df.groupBy(*group_cols).agg(
        F.min(value).alias("_lo"), F.max(value).alias("_hi"),
        F.count(value).alias("_n"),
    )
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    binned = (
        df.join(F.broadcast(bounds), group_cols)
        .select(
            *group_cols, "_lo", "_hi", "_n",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.floor((value - F.col("_lo")) / width).cast("long"),
                    F.lit(n_bins - 1),
                )
            ).alias("_bin"),  # degenerate group (lo == hi): single bin 0
        )
        .groupBy(*group_cols, "_lo", "_hi", "_n", "_bin")
        .count()
    )
    cum = binned.withColumn(
        "_cum",
        F.sum("count").over(
            Window.partitionBy(*group_cols).orderBy("_bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # all quantiles in ONE pass over the cumulative histogram: explode
    # the quantile list per bin row (≤ n_bins·|qs| rows per group) and
    # take min bin per (group, q) — a per-q union would recompute the
    # window once per quantile
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in quantiles]))
    return (
        cum.withColumn("quantile", qcol)
        .filter(F.col("_cum") >= F.col("_n") * F.col("quantile"))
        .groupBy(*group_cols, "_lo", "_hi", "quantile")
        .agg(F.min("_bin").alias("_qbin"))
        .select(
            *group_cols,
            "quantile",
            F.round(
                F.col("_lo")
                + F.col("_qbin") * (F.col("_hi") - F.col("_lo")) / n_bins,
                4,
            ).alias("value_est"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (heavy hitters)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_build(
    df: DataFrame, key: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(r, c, cnt): the depth×width count-min counter matrix. The
    groupBy is a bounded-cardinality partial aggregate (≤ depth·width
    rows survive per partition), so shuffle volume is fixed at any
    input size — the sketch property. Counters are BIGINTs: every
    estimate is integer-exact and engine-portable."""
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("r"),
            (portable_hash32(
                F.concat_ws("|", F.lit(str(i)), key.cast("string"))
            ) % width).alias("c"),
        )
        for i in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("cell"))
        .select("cell.r", "cell.c")
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    key: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimated frequency (min over the depth counters) for each
    candidate key. Overestimates only — never undercounts — so top-k
    by estimate is a superset-safe heavy-hitter query. The sketch side
    is ≤ depth·width rows: always broadcastable."""
    probes = candidates.select(
        key.alias("key"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("r"),
                (portable_hash32(
                    F.concat_ws("|", F.lit(str(i)), key.cast("string"))
                ) % width).alias("c"),
            )
            for i in range(depth)
        ])).alias("cell"),
    ).select("key", "cell.r", "cell.c")
    return (
        probes.join(F.broadcast(cms), ["r", "c"], "inner")
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
    )
