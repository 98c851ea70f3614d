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
