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
    # The 14 round-11 additions without any driver-issued CORRECTNESS row
    # must occupy the head of the round-11 window (first-evidence >
    # stale-refresh), followed by the q_weather_hourly flagship slot
    # (latest row r6) and the 40 stalest round-5 entries.
    never = [
        "q_incremental_neardup", "q_ann_index_persist",
        "q_ann_index_append", "q_stream_ingest_dedup", "q_cdc_apply",
        "q_anova_f", "q_concurrency", "q_rake_keywords",
        "q_clustering_depth", "q_window_funnel", "q_label_propagation",
        "q_cluster_split", "q_schema_evolution", "q_stream_mg_topk",
    ]
    assert entry._CHECK_FIRST[: len(never)] == never
    assert entry._CHECK_FIRST[len(never)] == "q_weather_hourly"
    # the 50-slot window is spent entirely on first-evidence + stale
    # entries; the five (r10-fresh) flagships sit just past it
    assert entry._CHECK_FIRST[50:55] == [
        "q_enrich", "q_trips_weather", "q_daily",
        "q_zone_analysis", "q_fare_daily_features",
    ]
