"""Property-based tests for the round-8 cores: the CUSUM prefix
identity over arbitrary integer series, the quantile-summary rank bound
over arbitrary value multisets, and bloom_probe's row-preservation
contract (the round-8 advisor fix).

One DataFrame per hypothesis example; small example budgets because
every example is a Spark job (widen with SPARK_GRAFT_HYPOTHESIS_MAX).
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_MAX", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    devs=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40
    )
)
@settings(**SETTINGS)
def test_cusum_prefix_identity_on_random_series(spark, devs):
    """cusum_columns must equal the literal max-reset recurrence for ANY
    integer deviation series."""
    from nyc_taxi_data_warehouse_spark.operators.monitor import cusum_columns

    rows = [("g", i, d) for i, d in enumerate(devs)]
    df = spark.createDataFrame(rows, ["k", "t", "dev"])
    got = {
        r.t: r.s
        for r in cusum_columns(df, "k", "t", {"s": "dev"}).collect()
    }
    s = 0
    for i, d in enumerate(devs):
        s = max(0, s + d)
        assert got[i] == s, (i, devs)


@given(
    vals=st.lists(
        st.integers(min_value=-500, max_value=500), min_size=4, max_size=120
    ),
    g=st.integers(min_value=2, max_value=8),
)
@settings(**SETTINGS)
def test_shard_summary_rank_bound_on_random_multisets(spark, vals, g):
    """For ANY multiset and grid width G: the merged lower bound g(v) of
    the per-shard boundary-crossing summaries never exceeds the true
    rank, and answering rank r with min{v : g(v) >= r} overshoots by at
    most sum_s ceil(n_s/G)."""
    from nyc_taxi_data_warehouse_spark.operators.sampling import (
        bucketed_value_cumsum,
    )

    rows = [(float(v), i % 3) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["v", "shard"])
    cdf = bucketed_value_cumsum(df, "v", ("shard",)).collect()
    n_s: dict[int, int] = {}
    for r in cdf:
        n_s[r.shard] = max(n_s.get(r.shard, 0), r["__cle"])
    summ: dict[int, list] = {}
    for r in cdf:
        cle, c = r["__cle"], r["__c"]
        if (cle * g) // n_s[r.shard] > ((cle - c) * g) // n_s[r.shard]:
            summ.setdefault(r.shard, []).append((r["__v"], cle))
    for lst in summ.values():
        lst.sort()
        assert len(lst) <= g

    def glb(x):
        tot = 0
        for lst in summ.values():
            best = 0
            for sv, scle in lst:
                if sv > x:
                    break
                best = scle
            tot += best
        return tot

    svals = sorted(float(v) for v in vals)
    n = len(svals)
    cands = sorted({sv for lst in summ.values() for sv, _ in lst})
    bound = sum(-(-ns // g) for ns in n_s.values())
    for q in (1, n // 2, n):
        true_rank_of = lambda x: sum(1 for v in svals if v <= x)
        est = next(v for v in cands if glb(v) >= q)
        assert glb(est) <= true_rank_of(est)
        assert true_rank_of(est) >= q
        assert true_rank_of(est) - q <= bound, (q, est, bound)


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=40
    )
)
@settings(**SETTINGS)
def test_bloom_probe_preserves_duplicate_rows(spark, keys):
    """bloom_probe must return EXACTLY the probe rows — duplicates
    included — with zero false negatives for member keys (the round-8
    advisor fix: the old explode→groupBy shape collapsed duplicates)."""
    from collections import Counter

    from nyc_taxi_data_warehouse_spark.operators import sketches

    members = spark.createDataFrame(
        [(k,) for k in sorted(set(keys))], ["k"]
    )
    probes = spark.createDataFrame([(k,) for k in keys], ["k"])
    bits = sketches.bloom_bits(members, "k", m_bits=512, k_hashes=3)
    out = sketches.bloom_probe(bits, probes, "k", m_bits=512, k_hashes=3)
    got = out.collect()
    assert Counter(r.k for r in got) == Counter(keys)
    assert all(r.may_contain == 1 for r in got)  # all probes are members
