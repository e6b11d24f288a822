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
    # r4 went 50/50 green, so nothing is red; the round-5 must-prove
    # set is the 11 entries whose only driver evidence predates the
    # MICROS-NTZ testdata migration (r1)...
    "s1_scan_project_alias", "p2_select_star", "p3_filter_neq",
    "p4_p9_filter_notnull_neq", "a2_integer_avg", "a6_distinct",
    "t3_limit",
    "sim_bruteforce_topk", "sim_ivf_assign", "sim_ivf_topk",
    "multi_decode_meta",
    # ...plus the entry whose plan construction changed this round
    # (plane matrix now a JVM-parsed literal)...
    "dedup_embedding_lsh",
    # ...plus the entries new in round 5.
    "samp_token_budget", "samp_label_balance", "sim_knn_label_vote",
    "sk_hll_daily_users", "a15_pricing_summary",
    "a16_measure_correlation", "stream_attributed_hourly",
    "tj_asof_forward_tol", "w8_forward_fill", "p12_prefix_filter",
    "dedup_affix_groups", "sim_quantized_topk",
    "samp_epoch_shard_shuffle", "p13_above_customer_avg",
    "decon_bloom_prefilter",
    "ivm_agg_merge", "j9_reconcile_orders_lines", "dedup_span_chunks",
    "text_bigram_topk", "w9_cume_dist_nth",
    "p14_exists_semi", "dedup_keep_best", "sim_centroid_outlier",
    "ts_gapfill_daily", "funnel_steps", "cohort_retention",
    "a18_event_histogram", "dedup_minhash_jaccard_est",
    "samp_negative_mining",
    # ...plus the two driver-env-sensitive classes from the late
    # round-5 batch (timestamp output; libm-ln micro-nats).
    "ts_max_concurrency", "dq_category_entropy",
}


def test_priority_names_all_registered():
    assert not [n for n in DRIVER_PRIORITY if n not in REGISTRY]


def test_ordered_registry_is_complete_permutation():
    assert set(ordered_registry()) == set(REGISTRY)


def test_must_prove_entries_inside_evaluated_prefix():
    prefix = set(list(ordered_registry())[:50])
    missing = MUST_PROVE - prefix
    assert not missing, f"unproven entries outside the driver cap: {missing}"
