"""Deterministic sampling/splitting: membership must depend only on
(key, salt, params) — never on partitioning, row order, or run count —
and the membership predicates must stay pure Catalyst expressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "zh", "es", "de", "fr"][i % 5]) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_hash_split_is_partitioning_invariant(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = sampling.hash_split(docs, F.col("doc_id"), w)
    b = sampling.hash_split(
        docs.repartition(13, "lang").sortWithinPartitions(F.desc("doc_id")),
        F.col("doc_id"), w,
    )
    assert sorted(map(tuple, a.select("doc_id", "split").collect())) == sorted(
        map(tuple, b.select("doc_id", "split").collect())
    )


def test_hash_split_ratios_and_exhaustiveness(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = dict(
        sampling.hash_split(docs, F.col("doc_id"), w)
        .groupBy("split").count().collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000  # exhaustive, no dropped rows
    assert 700 <= counts["train"] <= 900  # ~80% of 1000
    assert counts["val"] + counts["test"] <= 300


def test_hash_split_rejects_degenerate_weights(spark, docs):
    with pytest.raises(ValueError):
        sampling.hash_split(docs, F.col("doc_id"), {"a": 0.0})


def test_deterministic_sample_fraction_and_stability(spark, docs):
    kept = sampling.deterministic_sample(docs, F.col("doc_id"), 0.3)
    n = kept.count()
    assert 220 <= n <= 380  # ~30% of 1000
    # same salt → identical membership on a re-run
    again = sampling.deterministic_sample(docs, F.col("doc_id"), 0.3)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # different salt → a genuinely different (still ~30%) draw
    other = sampling.deterministic_sample(docs, F.col("doc_id"), 0.3, salt="s2")
    assert sorted(r.doc_id for r in other.collect()) != sorted(
        r.doc_id for r in kept.collect()
    )
    with pytest.raises(ValueError):
        sampling.deterministic_sample(docs, F.col("doc_id"), 1.5)


def test_stratified_sample_per_stratum_fractions(spark, docs):
    kept = sampling.stratified_sample(
        docs, F.col("lang"), F.col("doc_id"),
        {"en": 0.0, "zh": 0.5}, default_fraction=1.0,
    )
    counts = dict(kept.groupBy("lang").count().collect())
    assert "en" not in counts  # fraction 0 → stratum fully dropped
    assert 60 <= counts["zh"] <= 140  # ~50% of 200
    for tail in ("es", "de", "fr"):
        assert counts[tail] == 200  # default 1.0 keeps the tail whole
    with pytest.raises(ValueError):
        sampling.stratified_sample(
            docs, F.col("lang"), F.col("doc_id"), {"en": 2.0}
        )


def test_per_group_sample_exact_size_and_determinism(spark, docs):
    got = sampling.per_group_sample(docs, ["lang"], F.col("doc_id"), n=7)
    counts = dict(got.groupBy("lang").count().collect())
    assert all(c == 7 for c in counts.values()) and len(counts) == 5
    again = sampling.per_group_sample(
        docs.repartition(17), ["lang"], F.col("doc_id"), n=7
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))
    # groups smaller than n survive whole
    tiny = sampling.per_group_sample(
        docs.filter("doc_id < 3"), ["lang"], F.col("doc_id"), n=7
    )
    assert tiny.count() == 3


def test_weighted_sample_pps_properties(spark, docs):
    """PPS membership: partition/order invariant, monotone in weight
    (capped rows always kept when bucket < N_BUCKETS... i.e. weight
    >= cap means certain keep only when the hash allows — verify the
    exact integer rule instead), and matches a row-level recompute."""
    import pytest

    from olist_data_warehouse_spark.operators.sampling import (
        N_BUCKETS,
        hash_bucket,
    )

    # synthetic integer weight spanning [0, 100): below, at, above cap
    d = docs.withColumn("wt", (F.col("doc_id") % 100).cast("long"))
    w = F.col("wt")
    kept = sampling.weighted_sample(d, F.col("doc_id"), w, cap=64)
    got = sorted(r.doc_id for r in kept.select("doc_id").collect())

    # invariant under partitioning/order
    again = sampling.weighted_sample(
        d.repartition(13), F.col("doc_id"), w, cap=64
    )
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == got

    # row-level recompute of the integer rule
    ref = d.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), "wpps").alias("b"),
        F.least(F.col("wt"), F.lit(64).cast("long")).alias("w"),
    ).collect()
    want = sorted(r.doc_id for r in ref if r.b * 64 < r.w * N_BUCKETS)
    assert got == want

    # weight >= cap rows keep with probability 1 in expectation terms:
    # every such row's threshold is the full bucket range
    certain = [r.doc_id for r in ref if r.w >= 64]
    assert set(certain) <= set(got)

    with pytest.raises(ValueError):
        sampling.weighted_sample(d, F.col("doc_id"), w, cap=0)


@pytest.fixture(scope="module")
def sized_docs(spark):
    # deterministic pseudo-random sizes 10..109 tokens per doc
    rows = [
        (i, ["en", "zh", "es", "de", "fr"][i % 5], 10 + (i * 37) % 100)
        for i in range(1000)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, n_tokens bigint"
    )


def test_token_budget_respects_budget_and_is_invariant(spark, sized_docs):
    got = sampling.token_budget_sample(
        sized_docs, ["lang"], F.col("doc_id"), F.col("n_tokens"), budget=500
    )
    # per-group totals never exceed the budget
    totals = dict(
        got.groupBy("lang").agg(F.sum("n_tokens")).collect()
    )
    assert totals and all(t <= 500 for t in totals.values())
    # the selection is maximal in hash order: the largest cum_size plus
    # the next (unkept) row's size must overshoot — i.e. at least one
    # row was excluded per group (budget 500 << per-group token total)
    kept_per_group = dict(got.groupBy("lang").count().collect())
    all_per_group = dict(sized_docs.groupBy("lang").count().collect())
    assert all(kept_per_group[g] < all_per_group[g] for g in all_per_group)
    # partitioning-invariant
    again = sampling.token_budget_sample(
        sized_docs.repartition(13), ["lang"], F.col("doc_id"),
        F.col("n_tokens"), budget=500,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_token_budget_first_row_larger_than_budget_drops_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 999)], "doc_id bigint, lang string, n_tokens bigint"
    )
    got = sampling.token_budget_sample(
        df, ["lang"], F.col("doc_id"), F.col("n_tokens"), budget=100
    )
    assert got.count() == 0
    with pytest.raises(ValueError):
        sampling.token_budget_sample(
            df, ["lang"], F.col("doc_id"), F.col("n_tokens"), budget=0
        )


def test_balanced_sample_equalizes_to_min_class(spark):
    rows = [(i, i % 3) for i in range(90)] + [(1000 + i, 3) for i in range(7)]
    df = spark.createDataFrame(rows, "vec_id bigint, label int")
    got = sampling.balanced_sample(df, "label", F.col("vec_id"))
    counts = dict(got.groupBy("label").count().collect())
    assert counts == {0: 7, 1: 7, 2: 7, 3: 7}
    # invariant under partitioning
    again = sampling.balanced_sample(df.repartition(11), "label", F.col("vec_id"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_token_budget_monotone_in_budget(spark, sized_docs):
    """A larger budget keeps a SUPERSET of a smaller budget's rows —
    the hash-order walk means raising the budget can only extend each
    group's kept prefix, never reshuffle it (what makes incremental
    budget raises safe in production)."""
    kept = {}
    for b in (200, 500, 900):
        kept[b] = {
            r["doc_id"]
            for r in sampling.token_budget_sample(
                sized_docs, ["lang"], F.col("doc_id"), F.col("n_tokens"),
                budget=b,
            ).collect()
        }
    assert kept[200] < kept[500] < kept[900]


def test_cluster_split_no_near_dup_straddles_splits(spark):
    """Leakage-safety contract of samp_cluster_split: every member of a
    near-dup cluster lands in the SAME split, all documents are
    assigned, and the output is invariant to input partitioning."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["samp_cluster_split"].fn(spark, sf).collect()
    n_docs = (
        spark.read.parquet(f"{sf}/documents.parquet").count()
    )
    assert len(rows) == n_docs
    split_of = {}
    for r in rows:
        assert r.split in ("train", "val", "test")
        if r.group_id in split_of:
            assert split_of[r.group_id] == r.split, (
                f"cluster {r.group_id} straddles splits"
            )
        split_of[r.group_id] = r.split
    # multi-member clusters must exist at this SF or the test is vacuous
    from collections import Counter
    sizes = Counter(r.group_id for r in rows)
    assert any(v > 1 for v in sizes.values())
