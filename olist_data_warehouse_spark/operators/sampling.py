"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus needs reproducible sampling: `df.sample()` reshuffles
membership on every partition-layout change, which silently leaks
held-out data between runs. Every operator here instead derives
membership from a content hash of a stable key — the same row lands in
the same split/sample on any cluster, any partitioning, any engine
(the hash is the portable md5-based 32-bit family shared with
`operators/textops.py`, so DuckDB oracles can re-derive membership
exactly).

All operators are pure Catalyst column expressions — no shuffle is
added by split/sample membership itself (it's a filter/withColumn);
only `per_group_sample` shuffles, once, on the group key (the same
exchange a per-group top-k needs). Scale posture: membership tests are
scans with a codegen'd predicate — they pipeline into whatever reads
the data next and prune columns/partitions as usual.

No analog in the reference (a SQL Server DW has no train/test split);
this is part of the engine's LLM-pipeline surface (north star:
BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olist_data_warehouse_spark.operators.textops import portable_hash32

# Membership granularity: hash buckets in [0, 10_000) → fractions are
# exact to 0.01%. Coarse enough that bucket boundaries are stable
# under float weights, fine enough for real split ratios.
N_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from a salted content
    hash of ``key``. Changing the salt resamples independently —
    distinct salts give (approximately) independent assignments."""
    return (
        portable_hash32(F.concat_ws("|", F.lit(salt), key.cast("string")))
        % N_BUCKETS
    )


def hash_split(
    df: DataFrame, key: Column, weights: dict[str, float], salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/...) by hashing
    ``key`` into cumulative weight ranges. Deterministic: a row's split
    depends only on (key, salt, weights), never on partitioning or
    row order — re-runs and backfills can't leak held-out rows.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = hash_bucket(key, salt)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name] / total * N_BUCKETS
        cond = b < int(round(hi))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame, key: Column, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows by content hash — the reproducible
    replacement for ``df.sample(fraction)``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_bucket(key, salt) < int(round(fraction * N_BUCKETS)))


def stratified_sample(
    df: DataFrame,
    strata: Column,
    key: Column,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible
    ``df.sampleBy``): each stratum value gets its own keep-fraction,
    e.g. downsample dominant languages while keeping the tail intact.
    The threshold map compiles to a codegen'd CASE — no join, no
    shuffle, works on any cardinality of strata listed explicitly."""
    thr = F.lit(int(round(default_fraction * N_BUCKETS)))
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        thr = F.when(strata == value, int(round(frac * N_BUCKETS))).otherwise(thr)
    return df.filter(hash_bucket(key, salt) < thr)


def weighted_sample(
    df: DataFrame, key: Column, weight: Column, cap: int, salt: str = "wpps"
) -> DataFrame:
    """Probability-proportional-to-size Bernoulli sampling: keep a row
    with probability ``min(weight, cap) / cap`` from an INTEGER weight
    column (token count, byte length, dup-cluster size...). The corpus
    move "sample long documents proportionally more" without a sort.

    Membership is the pure-integer inequality
    ``hash_bucket * cap < min(weight, cap) * N_BUCKETS`` — no float
    round/pow anywhere, so assignment is bit-identical on any engine,
    partitioning, or row order (float thresholds flip rows whose
    probability lands within an ulp of the boundary; integers can't).
    Codegen'd filter, no shuffle.
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    b = hash_bucket(key, salt)
    w = F.least(weight.cast("long"), F.lit(int(cap)).cast("long"))
    return df.filter(b * int(cap) < w * N_BUCKETS)


def per_group_sample(
    df: DataFrame, group_cols: list[str], key: Column, n: int, salt: str = "pergroup"
) -> DataFrame:
    """Exactly ≤n rows per group, chosen by hash order — a
    deterministic reservoir sample. One hash shuffle on the group key
    (same exchange as a per-group top-k; no global sort), so it scales
    to any number of groups; per-group state is a running count."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(hash_bucket(key, salt).asc(), key.cast("string").asc())
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def domain_mixture(
    df: DataFrame,
    domain: Column | str,
    key: Column,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample to a target domain mixture.

    Training corpora are blended to target proportions (so much web, so
    much code, per-language shares...). Given relative ``weights`` per
    domain value, this keeps the **largest subset achievable without
    upsampling**: total size S = min_g(n_g / w_g), per-domain keep-rate
    r_g = w_g * S / n_g, membership by salted content hash — so the
    blend is reproducible on any partitioning and any engine.

    Scale shape: the group-count aggregate touches one row per domain
    (partial agg map-side), the min-over-groups window runs on that
    domain-cardinality table (thousands of rows at most), and the rate
    table joins back as a **broadcast** — the corpus itself is only
    scanned, filtered by a codegen'd predicate, never shuffled. Domains
    missing from ``weights`` are dropped (weight 0).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    dom = F.col(domain) if isinstance(domain, str) else domain
    wexpr: Column | None = None
    for value, w in weights.items():
        lit = F.lit(w / total).cast("double")
        wexpr = (
            F.when(F.col("_dom") == value, lit)
            if wexpr is None
            else wexpr.when(F.col("_dom") == value, lit)
        )
    counts = (
        df.groupBy(dom.alias("_dom"))
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_w", wexpr)
        .filter(F.col("_w").isNotNull())
    )
    counts = counts.withColumn(
        "_S", F.min(F.col("_n") / F.col("_w")).over(Window.partitionBy())
    )
    rates = counts.select(
        "_dom",
        F.floor(F.col("_w") * F.col("_S") / F.col("_n") * N_BUCKETS)
        .cast("long")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(rates), dom == F.col("_dom"), "inner")
        .filter(hash_bucket(key, salt) < F.col("_thr"))
        .drop("_dom", "_thr")
    )


def token_budget_sample(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    size: Column,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Per-group token-budget selection: walk each group's rows in
    salted-hash order and keep rows while the running ``size`` total
    (inclusive) stays within ``budget`` — "take ~N tokens per source",
    the unit corpora are actually blended in, rather than row counts
    (`per_group_sample`) or rates (`domain_mixture`).

    Membership is deterministic: a row's fate depends only on (key,
    salt, the group's other keys/sizes), never on partitioning or
    arrival order. Adds a ``cum_size`` column (the inclusive running
    total) so callers can audit how full each group's budget ran.

    Scale shape: ONE hash shuffle on the group key, running-sum window
    state is a single long per group — the same exchange budget as any
    per-group top-k. No sort beyond the per-partition window order, no
    collect, no second pass.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(hash_bucket(key, salt).asc(), key.cast("string").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_size", F.sum(size.cast("long")).over(w))
        .filter(F.col("cum_size") <= budget)
    )


def balanced_sample(
    df: DataFrame,
    group_col: str,
    key: Column,
    salt: str = "balance",
) -> DataFrame:
    """Class-rebalancing undersample: keep exactly min-class-size rows
    per ``group_col`` value, chosen by salted-hash order — the
    deterministic version of "downsample every class to the rarest
    class" used to de-skew labeled training sets.

    Scale shape: the class-size aggregate is map-side combined (one row
    per class), its global min is a one-row broadcast, and the pick is
    the same one-shuffle row_number window as `per_group_sample` —
    the corpus shuffles once on the class key, small side broadcast,
    never collected.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    floor = counts.agg(F.min("_n").alias("_m"))
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(key, salt).asc(), key.cast("string").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(floor))
        .filter(F.col("_rn") <= F.col("_m"))
        .drop("_rn", "_m")
    )
