"""Round-12 additions: property tests for the round-11 graph/eval cores
(VERDICT r11 item 5) — label propagation and interval-overlap depth vs
literal replays — plus the persisted signature-store query plumbing."""

from __future__ import annotations

import os
from collections import Counter, defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_MAX = int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_MAX", "8"))
_H_SETTINGS = dict(max_examples=_MAX, deadline=None)


# --- label propagation vs literal synchronous replay -------------------------

def _lpa_literal(edges, rounds):
    """Literal synchronous LPA in plain dicts: every node (any edge
    source) starts as its own label; each round EVERY node
    simultaneously adopts its neighbors' most frequent label, ties to
    the smallest label.  Duplicate edges count with multiplicity —
    exactly what the operator's join-then-count does."""
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
    lab = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            cnt = Counter(lab[m] for m in ns if m in lab)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        lab = new
    return lab


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=30,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
@settings(**_H_SETTINGS)
def test_label_propagation_matches_literal_replay(spark, pairs, rounds):
    """graph.label_propagation on a SYMMETRIZED random multigraph must
    equal the literal dict-based synchronous replay for any round count
    — including oscillating bipartite shapes (the reason the operator is
    a fixed unroll, not a convergence loop)."""
    from nyc_taxi_data_warehouse_spark.operators.graph import (
        label_propagation,
    )

    both = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(both, "src bigint, dst bigint")
    got = {
        r.node: r.lab
        for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == _lpa_literal(both, rounds)


# --- interval-overlap depth vs literal O(n^2) count ---------------------------

@given(
    iv=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ).map(lambda t: (min(t), max(t))),
        min_size=1,
        max_size=15,
        unique=True,
    ),
)
@settings(**_H_SETTINGS)
def test_interval_overlap_depth_matches_literal(spark, iv):
    """zorder.interval_overlap_depth must equal the textbook O(n²)
    overlap count (self included) for any interval set, and pass the
    non-range columns through untouched."""
    from nyc_taxi_data_warehouse_spark.operators.zorder import (
        interval_overlap_depth,
    )

    rows = [(i, lo, hi) for i, (lo, hi) in enumerate(iv)]
    df = spark.createDataFrame(rows, "fid bigint, min_ck bigint, max_ck bigint")
    got = {
        r.fid: r.depth
        for r in interval_overlap_depth(df, lo="min_ck", hi="max_ck").collect()
    }
    exp = {
        i: sum(1 for lo2, hi2 in iv if lo <= hi2 and lo2 <= hi)
        for i, (lo, hi) in enumerate(iv)
    }
    assert got == exp


# --- persisted signature-store query plumbing ---------------------------------

def test_store_roundtrip_versions_and_fresh_path(spark, tmp_path):
    """q_neardup_store_roundtrip's lifecycle helper must commit versions
    0/1/2 and judge generation 3 against the MERGED v1 snapshot: a gen-3
    exact copy of an ACCEPTED gen-2 doc reports exact_dup, while a copy
    of a REJECTED gen-2 doc does not hit the store's exact leg."""
    from nyc_taxi_data_warehouse_spark.operators import dedup

    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    g1 = mk([(1, base + " one"), (2, "totally different words here for two")])
    # 10 = fresh (accepted), 11 = exact dup of doc 1 (rejected)
    g2 = mk([(10, "fresh unrelated content number ten entirely"),
             (11, base + " one")])
    # 20 = copy of ACCEPTED 10 -> exact_dup; 21 = copy of REJECTED 11's
    # text = doc 1's text, which IS stored from g1 -> still exact_dup;
    # 22 = genuinely new
    g3 = mk([(20, "fresh unrelated content number ten entirely"),
             (21, base + " one"),
             (22, "nothing like anything stored before at all")])
    path = str(tmp_path / "store")
    _r1, v1 = dedup.neardup_store_ingest(spark, path, g1)
    r2, v2 = dedup.neardup_store_ingest(spark, path, g2)
    r3, v3 = dedup.neardup_store_ingest(spark, path, g3)
    assert (v1, v2, v3) == (0, 1, 2)
    d2 = {r.doc_id: r.decision for r in r2.collect()}
    assert d2 == {10: "new", 11: "exact_dup"}
    d3 = {r.doc_id: r.decision for r in r3.collect()}
    assert d3[20] == "exact_dup"  # gen-2 accepted doc IS in v1
    assert d3[21] == "exact_dup"  # same text as g1 doc 1 (stored at v0)
    assert d3[22] == "new"
