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


def test_coverage_doc_pins_the_registry_count():
    # The header's "(N entries as of round M" count must match the live
    # registry size, not just name live queries (round-8 VERDICT item 6).
    text = open("COVERAGE.md").read()
    m = re.search(r"\((\d+) entries as of round", text)
    assert m, "COVERAGE.md header lost its registry count"
    assert int(m.group(1)) == len(entry.queries()), (
        f"COVERAGE.md header says {m.group(1)} entries; "
        f"live registry has {len(entry.queries())}"
    )
