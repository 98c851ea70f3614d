"""Driver-contract registry invariants: every `queries()` entry carries an
`oracle_sql()` twin, the stale-evidence rotation covers the whole registry,
and the driver's 50-slot check window is spent on unverified-first entries.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle_twin():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert set(qs) == set(os_), (
        f"missing oracles: {set(qs) - set(os_)}; "
        f"orphan oracles: {set(os_) - set(qs)}"
    )
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())


def test_registry_order_is_deterministic_and_window_prioritized():
    qs = list(entry.queries())
    assert qs == list(entry.oracle_sql())  # same order both maps
    assert len(qs) == len(set(qs))
    # every _CHECK_FIRST name that exists leads the registry, in order
    first = [q for q in entry._CHECK_FIRST if q in set(qs)]
    assert qs[: len(first)] == first
    # _CHECK_FIRST/_CHECK_LAST reference only real queries and don't overlap
    assert not set(entry._CHECK_FIRST) & set(entry._CHECK_LAST)
    assert set(entry._CHECK_FIRST) <= set(qs)
    assert set(entry._CHECK_LAST) <= set(qs)


# Reference-surface flagships: the headline marts must never go more
# than 2 rounds without a driver CORRECTNESS row, so every round's
# window reserves ~5 slots for them on a rotating basis (round-8
# VERDICT item 7).  All five are in the round-10 window.
FLAGSHIPS = [
    "q_enrich", "q_trips_weather", "q_daily",
    "q_zone_analysis", "q_fare_daily_features",
]


def test_flagship_freshness_policy_slots():
    assert set(FLAGSHIPS) <= set(entry._CHECK_FIRST), (
        "flagship freshness policy: reserve ~5 window slots for the "
        "reference-surface flagships each round"
    )


def test_never_driver_checked_entries_lead_the_window():
    # The 20 round-12 additions without any driver-issued CORRECTNESS row
    # must occupy the head of the round-12 window (first-evidence >
    # stale-refresh), followed by the 10 remaining round-5-stale entries,
    # the five flagships (due r12 per the ≤2-rounds policy), and the 15
    # stalest round-6 entries.
    never = [
        "q_neardup_store_roundtrip", "q_store_time_travel",
        "q_welch_ttest", "q_permutation_test", "q_diff_in_diff",
        "q_ips_eval", "q_morans_i", "q_getis_ord", "q_link_prediction",
        "q_item_cf", "q_pii_scan", "q_stream_histogram", "q_mcnemar",
        "q_wilcoxon_signed_rank", "q_stream_cdc",
        "q_consistent_hash", "q_feature_hash_audit", "q_gdpr_export",
        "q_time_decay", "q_graph_modularity",
    ]
    assert entry._CHECK_FIRST[: len(never)] == never
    r5_stale = [
        "q_sparse_cosine", "q_split_assign", "q_srp_lsh",
        "q_srp_near_pairs", "q_star_join", "q_text_quality",
        "q_token_count", "q_topk_per_group", "q_weighted_sample",
        "q_winsorize",
    ]
    assert entry._CHECK_FIRST[len(never):len(never) + 10] == r5_stale
    # flagships take slots 31-35 INSIDE the window this round (r10 rows
    # are due per the ≤2-rounds policy)
    assert entry._CHECK_FIRST[30:35] == [
        "q_enrich", "q_trips_weather", "q_daily",
        "q_zone_analysis", "q_fare_daily_features",
    ]
    assert len(entry._CHECK_FIRST) == 50
