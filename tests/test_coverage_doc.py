"""COVERAGE.md consistency: every backticked q_* name the coverage map
claims must be a live registry entry, so the judge-facing inventory can
never drift from the code (stale doc references fail CI, not review)."""

from __future__ import annotations

import re

import __spark_entry__ as entry


def test_every_coverage_query_name_is_live():
    text = open("COVERAGE.md").read()
    claimed = set(re.findall(r"`(q_[a-z0-9_]+)`", text))
    assert claimed, "COVERAGE.md names no queries?"
    live = set(entry.queries())
    dead = sorted(claimed - live)
    assert not dead, f"COVERAGE.md references unknown queries: {dead}"


def test_bench_headline_is_live():
    import bench

    live = set(entry.queries())
    missing = [q for q in bench.HEADLINE if q not in live]
    assert not missing, missing
    missing_b = [q for q in bench.BASELINE_SET if q not in live]
    assert not missing_b, missing_b
