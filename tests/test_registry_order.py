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
    # r5 went 50/50 green, so every round-5 must-prove entry has a
    # driver row and leaves the set. The round-6 must-prove set is
    # exactly the entries whose BEHAVIOR changed this round (the rest
    # of the prefix is evidence rotation over the never-evaluated
    # pool — desirable, but already sweep-green and unchanged):
    # the three banded-rank swaps (rank now two-pass range-banded),
    "pack_balanced_shards", "a29_gini_concentration",
    "a31_lorenz_deciles",
    # the pandas-parity per-direction nearest tolerance (engine AND
    # oracle moved),
    "tj_asof_nearest",
    # the once-per-DAG shortlist persist in MMR,
    "sim_mmr_rerank",
    # and the degenerate-length guard on the binned interval join.
    "tj_interval_overlap",
}


def test_priority_names_all_registered():
    assert not [n for n in DRIVER_PRIORITY if n not in REGISTRY]


def test_ordered_registry_is_complete_permutation():
    assert set(ordered_registry()) == set(REGISTRY)


def test_must_prove_entries_inside_evaluated_prefix():
    prefix = set(list(ordered_registry())[:50])
    missing = MUST_PROVE - prefix
    assert not missing, f"unproven entries outside the driver cap: {missing}"
