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
# than 2 rounds without a driver CORRECTNESS row (round-8 VERDICT item
# 7).  Refreshed in round 12 → due round 14: this round they LEAD
# _CHECK_LAST so the round-14 window picks them up first.
FLAGSHIPS = [
    "q_enrich", "q_trips_weather", "q_daily",
    "q_zone_analysis", "q_fare_daily_features",
]


def test_flagship_freshness_policy_slots():
    assert entry._CHECK_LAST[: len(FLAGSHIPS)] == FLAGSHIPS, (
        "flagship freshness policy: r12-refreshed flagships are due r14 "
        "— they must lead _CHECK_LAST for the round-14 window"
    )


def test_never_driver_checked_entries_lead_the_window():
    # Round-13 window (VERDICT r12 item 1): the 8 round-13 additions
    # (first-evidence > stale-refresh), then the 29 remaining
    # round-6-stale entries (retiring the r6 evidence tail), then the
    # 13 stalest round-7 entries.
    never = [
        "q_neardup_store_bucketed", "q_levene", "q_cuped", "q_sprt",
        "q_shapley_attribution", "q_hilbert_cells", "q_holt_linear",
        "q_dbscan", "q_att_stratified", "q_closeness_centrality",
        "q_tokenizer_fertility",
    ]
    assert entry._CHECK_FIRST[: len(never)] == never
    r6_stale_edges = ("q_ivfpq_recall", "q_zone_dim")
    assert entry._CHECK_FIRST[11] == r6_stale_edges[0]
    assert entry._CHECK_FIRST[39] == r6_stale_edges[1]
    r7_stale_edges = ("q_ann_ivf", "q_divergence_drift")
    assert entry._CHECK_FIRST[40] == r7_stale_edges[0]
    assert entry._CHECK_FIRST[49] == r7_stale_edges[1]
    assert len(entry._CHECK_FIRST) == 50
    # the 3 displaced r7 entries sit just behind the flagships, still
    # ahead of everything fresher, for the round-14 window
    assert entry._CHECK_LAST[5:8] == [
        "q_dsir_select", "q_gopher_rules", "q_hll_distinct",
    ]
