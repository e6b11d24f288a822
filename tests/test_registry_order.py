"""The driver evaluates a bounded prefix (~50) of queries() — pin that
the prefix carries every entry that still needs driver evidence."""

from __future__ import annotations

from olist_data_warehouse_spark.plans.queries import (
    DRIVER_PRIORITY,
    REGISTRY,
    ordered_registry,
)

# Entries with no green driver row yet (fixed-this-round, new, or never
# evaluated) — these MUST sit inside the evaluated prefix. Keep in sync
# with the union of CORRECTNESS_r*.json: an entry leaves this set when
# a round records it green; it enters when registered or changed.
MUST_PROVE = {
    # r7 went 50/50 green, closing the union at 214/214 — every pre-r8
    # entry has a driver row. The round-8 must-prove set is
    # (a) the six NEW lakehouse entries and (b) every entry routed
    # through the dedup persist sites moved to the bounded-cache
    # convention this round (mechanics-only change; re-proven anyway).
    # (a) new in r8:
    "lake_delete_where", "lake_merge_upsert", "lake_schema_evolution",
    "lake_change_feed", "lake_cdf_incremental", "lake_stream_pipeline",
    "lake_time_travel", "lake_prune_read", "lake_zorder_prune",
    # (b) cache-convention-touched in r8:
    "dedup_ngram_jaccard", "dedup_containment", "dedup_containment_est",
    "dedup_minhash_lsh", "dedup_minhash_jaccard_est",
    "dedup_simhash_hamming", "dedup_cc_groups", "dedup_pipeline_eval",
    "samp_cluster_split",
    # (c) new sampling operator in r8:
    "samp_dsir_importance",
}


def test_priority_names_all_registered():
    assert not [n for n in DRIVER_PRIORITY if n not in REGISTRY]


def test_ordered_registry_is_complete_permutation():
    assert set(ordered_registry()) == set(REGISTRY)


def test_must_prove_entries_inside_evaluated_prefix():
    prefix = set(list(ordered_registry())[:50])
    missing = MUST_PROVE - prefix
    assert not missing, f"unproven entries outside the driver cap: {missing}"
