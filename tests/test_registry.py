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
# VERDICT item 7).  All five are in the round-9 window.
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
    # The 21 entries without any driver-issued CORRECTNESS row through
    # round 8 must occupy the head of the round-9 window.
    never = [
        "q_market_basket", "q_mixture_temperature", "q_key_skew",
        "q_ohlc_bars", "q_attribution", "q_cusum_changepoint",
        "q_quantile_summary", "q_entity_resolution", "q_frequent_sequences",
        "q_stream_cusum", "q_gaps_islands", "q_compaction_plan",
        "q_bh_fdr", "q_mannwhitney", "q_slo_burn", "q_calibration",
        "q_boilerplate_scrub", "q_dup_span_removal", "q_encoding_advisor",
        "q_matryoshka_recall", "q_spearman",
    ]
    assert entry._CHECK_FIRST[: len(never)] == never
