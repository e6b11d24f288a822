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
    # r6 went 50/50 green, so every round-6 must-prove entry has a
    # driver row and leaves the set. The round-7 must-prove set is
    # the union of (a) the 23 entries never evaluated by any driver
    # round (union r1-r6 = 189/212) and (b) the entries whose
    # behavior changed in the r6->r7 closure commit.
    # (a) never evaluated r1-r6:
    "attrib_multi_model", "samp_weighted_fixed_k", "dq_winsorize",
    "scd2_point_in_time", "ts_cusum_alerts", "t5_keyset_page",
    "reco_item_lift", "dq_benford_digits", "dq_snapshot_diff",
    "dq_psi_splits", "ivm_index_merge", "text_keywords_topk",
    "w10_range_numeric_frame", "sk_hll_set_algebra", "samp_soft_dedup",
    "f8_calendar_features", "a21_multi_distinct", "w11_ratio_to_report",
    "w12_rank_variants", "set_except_all", "stream_funnel_users",
    "stream_unattributed_join", "a13_approx_percentile_cert",
    # (b) behavior changed this round: a29/a31 observed-revenue
    # NULL-price contract (both engines moved), dq_ks_drift's banded
    # running-sum CDF, text_zipf_fit's limit-bounded rank.
    "a29_gini_concentration", "a31_lorenz_deciles", "dq_ks_drift",
    "text_zipf_fit",
    # (c) new or refactor-touched in r7: the containment dedup entry,
    # its minhash estimation twin, and the two entries now routed
    # through _shingle_pair_stats.
    "dedup_containment", "dedup_containment_est",
    "dedup_ngram_jaccard", "dedup_pipeline_eval",
}


def test_priority_names_all_registered():
    assert not [n for n in DRIVER_PRIORITY if n not in REGISTRY]


def test_ordered_registry_is_complete_permutation():
    assert set(ordered_registry()) == set(REGISTRY)


def test_must_prove_entries_inside_evaluated_prefix():
    prefix = set(list(ordered_registry())[:50])
    missing = MUST_PROVE - prefix
    assert not missing, f"unproven entries outside the driver cap: {missing}"
