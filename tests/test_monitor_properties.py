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


# --- round-9 stats cores (verdict r9 #6) -----------------------------------
#
# Each example materializes a synthetic sf dir (events written fresh, the
# nine untouched tables symlinked to 1-row stubs) and runs the FULL query
# through load_tables — the same code path the driver gates — against a
# literal Python rewrite or an algebraic invariant.

import datetime as _dt
import itertools as _it

import pytest

_D0 = _dt.date(2024, 1, 1)
_ex_counter = _it.count()


@pytest.fixture(scope="session")
def stub_dir(spark, sf_dir, tmp_path_factory):
    """One-row stub copies of every non-events table, written once."""
    d = tmp_path_factory.mktemp("stubs")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"{t}.parquet"))
    return d


def _events_dir(spark, stub_dir, tmp_path_factory, rows):
    """Fresh sf dir for one hypothesis example: unique path (so the
    load_tables persist cache can never serve a stale plan), stub tables
    symlinked, events written from `rows` of (user_id, event_type, value,
    day_offset)."""
    d = tmp_path_factory.mktemp(f"ev{next(_ex_counter)}")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        os.symlink(stub_dir / f"{t}.parquet", d / f"{t}.parquet")
    ev = [
        (
            i,
            _dt.datetime.combine(
                _D0 + _dt.timedelta(days=off), _dt.time(12, 0)
            ),
            int(uid),
            et,
            float(val),
            None,
        )
        for i, (uid, et, val, off) in enumerate(rows)
    ]
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@given(
    cohort=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),          # first_view day
            st.one_of(                                        # buy delay
                st.none(), st.integers(min_value=0, max_value=20)
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_km_curve_invariants_on_random_cohorts(
    spark, stub_dir, tmp_path_factory, cohort
):
    """For ANY cohort: S is in [0,1] and monotone nonincreasing, the
    at-risk ledger balances exactly (n_risk drops by d+censored per
    step, first step starts at the cohort size), and S matches the
    literal product-limit within quantization error."""
    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    rows = []
    for uid, (fv, delay) in enumerate(cohort):
        rows.append((uid, "view", 1.0, fv))
        if delay is not None:
            rows.append((uid, "purchase", 1.0, fv + delay))
    d = _events_dir(spark, stub_dir, tmp_path_factory, rows)
    got = sorted(qe.q_survival_km(spark, d).collect(), key=lambda r: r.t)
    assert got, cohort
    n_total = len(cohort)
    assert got[0].n_risk == n_total
    ledger, surv = n_total, 1.0
    for r in got:
        assert r.n_risk == ledger, (r, cohort)
        assert -1e-9 <= r.s_km <= 1.0 + 1e-9
        surv = 0.0 if r.d >= r.n_risk else surv * (1 - r.d / r.n_risk)
        assert abs(r.s_km - surv) <= 2e-6, (r, surv, cohort)
        ledger -= r.d + r.censored
    assert ledger == 0
    for a, b in zip(got, got[1:]):
        assert a.s_km >= b.s_km - 1e-12, (a, b)


@given(
    samples=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),           # group idx
            st.integers(min_value=-300, max_value=300),      # value cents
        ),
        min_size=4,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_kruskal_wallis_invariant_under_group_relabeling(
    spark, stub_dir, tmp_path_factory, samples
):
    """H (and z, p) must be invariant under renaming the groups — the
    statistic depends only on the rank structure, never on labels."""
    from hypothesis import assume

    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    groups = sorted({g for g, _ in samples})
    vals = {v for _, v in samples}
    assume(len(groups) >= 2 and len(vals) >= 2)
    rows_a = [
        (i, f"g{g}", v / 100.0, i % 10) for i, (g, v) in enumerate(samples)
    ]
    relabel = {g: f"z{9 - g}" for g in groups}  # reversed, disjoint names
    rows_b = [
        (i, relabel[g], v / 100.0, i % 10)
        for i, (g, v) in enumerate(samples)
    ]
    da = _events_dir(spark, stub_dir, tmp_path_factory, rows_a)
    db = _events_dir(spark, stub_dir, tmp_path_factory, rows_b)
    ra = qe.q_kruskal_wallis(spark, da).collect()[0]
    rb = qe.q_kruskal_wallis(spark, db).collect()[0]
    assert ra == rb, (ra, rb, samples)
    assert ra.k == len(groups) and ra.n == len(samples)
    assert ra.p is None or 0.0 <= ra.p <= 1.0 + 1e-9


@given(
    series=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),          # views
            st.integers(min_value=-5000, max_value=5000),    # revenue cents
        ),
        min_size=2,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_kendall_tau_matches_bruteforce_on_random_daily_series(
    spark, stub_dir, tmp_path_factory, series
):
    """tau-b from the query must equal the literal O(n²) definition on
    ANY daily series, and always lie in [-1, 1]."""
    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    rows = []
    for day, (nv, cents) in enumerate(series):
        rows.extend((day * 100 + k, "view", 1.0, day) for k in range(nv))
        rows.append((day * 100 + 99, "purchase", cents / 100.0, day))
    d = _events_dir(spark, stub_dir, tmp_path_factory, rows)
    got = qe.q_kendall_tau(spark, d).collect()[0]
    daily = [(nv, round(cents / 100.0 * 100)) for nv, cents in series]
    n0 = nc = nd = tx = ty = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            dx, dy = daily[i][0] - daily[j][0], daily[i][1] - daily[j][1]
            n0 += 1
            nc += dx * dy > 0
            nd += dx * dy < 0
            tx += dx == 0
            ty += dy == 0
    assert (got.n_days, got.n0, got.nc, got.nd, got.tx_p, got.ty_p) == (
        len(daily), n0, nc, nd, tx, ty,
    ), series
    if (n0 - tx) * (n0 - ty) == 0:
        assert got.tau_b is None
    else:
        tau = (nc - nd) / ((n0 - tx) * (n0 - ty)) ** 0.5
        assert abs(got.tau_b - tau) <= 2e-6 and -1 - 1e-9 <= got.tau_b <= 1 + 1e-9


@given(
    series=st.lists(
        st.integers(min_value=-100000, max_value=100000),    # revenue cents
        min_size=2,
        max_size=18,
    )
)
@settings(**SETTINGS)
def test_theil_sen_matches_bruteforce_on_random_daily_series(
    spark, stub_dir, tmp_path_factory, series
):
    """slope/intercept must equal the literal pairwise-median definition
    (lower median, identical rounding lattice) on ANY daily series."""
    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    rows = [
        (day, "purchase", cents / 100.0, day)
        for day, cents in enumerate(series)
    ]
    d = _events_dir(spark, stub_dir, tmp_path_factory, rows)
    got = qe.q_theil_sen(spark, d).collect()[0]
    t0 = (_D0 - _dt.date(1970, 1, 1)).days
    daily = [(t0 + day, cents) for day, cents in enumerate(series)]
    slopes = sorted(
        round(1e-9 + (y2 - y1) / (t2 - t1), 9)
        for i, (t1, y1) in enumerate(daily)
        for t2, y2 in daily[i + 1:]
    )
    assert got.n_days == len(daily) and got.n_pairs == len(slopes)
    slope = slopes[(len(slopes) - 1) // 2]
    assert got.slope == slope, series
    resid = sorted(round((y - slope * t) + 1e-9, 9) for t, y in daily)
    assert got.intercept == resid[(len(resid) - 1) // 2], series


# --- round-10 operator cores ------------------------------------------------


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # series key
            st.integers(min_value=0, max_value=500),   # obs minute
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=0,
        max_size=30,
    ),
    probes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # series key
            st.integers(min_value=0, max_value=500),   # probe minute
        ),
        min_size=1,
        max_size=30,
    ),
    tol=st.one_of(st.none(), st.integers(min_value=1, max_value=60)),
)
@settings(**SETTINGS)
def test_asof_join_multiseries_matches_bisect(spark, obs, probes, tol):
    """asof_join_latest with series_cols must, for ANY observation and
    probe sets, match each probe to the latest observation <= its ts in
    the SAME series (ties at equal ts match), NULL outside tolerance."""
    import bisect
    import datetime as dt

    from nyc_taxi_data_warehouse_spark.operators.asof import asof_join_latest

    t0 = dt.datetime(2024, 3, 1)
    odf = spark.createDataFrame(
        [
            (f"s{k}", t0 + dt.timedelta(minutes=m), float(v))
            for k, m, v in obs
        ]
        or [("s9", t0, 0.0)],  # schema anchor outside probe series
        "city string, ots timestamp, val double",
    )
    pdf = spark.createDataFrame(
        [
            (f"s{k}", t0 + dt.timedelta(minutes=m), i)
            for i, (k, m) in enumerate(probes)
        ],
        "city string, pts timestamp, pid long",
    )
    out = {
        r.pid: r
        for r in asof_join_latest(
            pdf,
            odf,
            probe_ts="pts",
            obs_ts="ots",
            value_cols=["val"],
            tolerance_minutes=tol,
            series_cols=["city"],
        ).collect()
    }
    assert len(out) == len(probes)
    by_series: dict[str, list] = {}
    for k, m, v in obs:
        by_series.setdefault(f"s{k}", []).append(m)
    for lst in by_series.values():
        lst.sort()
    for i, (k, m) in enumerate(probes):
        lst = by_series.get(f"s{k}", [])
        j = bisect.bisect_right(lst, m)
        exp_min = lst[j - 1] if j else None
        if exp_min is not None and tol is not None and m - exp_min > tol:
            exp_min = None
        got = out[i].matched_obs_ts
        exp = (
            t0 + __import__("datetime").timedelta(minutes=exp_min)
            if exp_min is not None
            else None
        )
        assert got == exp, (i, k, m, tol)
        if exp is not None:
            # equal-ts observation ties resolve deterministically to the
            # column-wise MAX (asof_join_latest pre-reduces per (series, ts))
            cands = {
                float(v) for kk, mm, v in obs
                if f"s{kk}" == f"s{k}" and mm == exp_min
            }
            assert out[i].val == max(cands)
        else:
            assert out[i].val is None


@given(
    series=st.lists(
        st.one_of(
            st.none(), st.integers(min_value=-40, max_value=40)
        ),
        min_size=2,
        max_size=48,
    )
)
@settings(**SETTINGS)
def test_resample_interpolate_matches_literal(spark, series):
    """resample_interpolate on ANY hourly series (None = missing hour)
    must reproduce the literal linear interpolation, pass observations
    through, and never extrapolate beyond the first/last observation."""
    import datetime as dt

    from hypothesis import assume

    from nyc_taxi_data_warehouse_spark.operators.timeseries import (
        resample_interpolate,
    )

    assume(any(v is not None for v in series))
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        ("c", t0 + dt.timedelta(hours=i), float(v))
        for i, v in enumerate(series)
        if v is not None
    ]
    df = spark.createDataFrame(rows, "city string, ts timestamp, v double")
    got = {
        r.hour_ts: r
        for r in resample_interpolate(df, "ts", ["city"], "v").collect()
    }
    known = [(i, float(v)) for i, v in enumerate(series) if v is not None]
    lo, hi = known[0][0], known[-1][0]
    # spine covers [first obs hour, last obs hour]
    assert len(got) == hi - lo + 1
    for i in range(lo, hi + 1):
        r = got[t0 + dt.timedelta(hours=i)]
        if series[i] is not None:
            assert r.v_observed and abs(r.v_interp - series[i]) <= 1e-9
            continue
        assert not r.v_observed
        prev = max((p for p in known if p[0] < i), key=lambda p: p[0])
        nxt = min((p for p in known if p[0] > i), key=lambda p: p[0])
        expect = prev[1] + (nxt[1] - prev[1]) * (i - prev[0]) / (
            nxt[0] - prev[0]
        )
        assert abs(r.v_interp - expect) <= 1e-9, (i, expect, r.v_interp)
        assert min(prev[1], nxt[1]) - 1e-9 <= r.v_interp <= max(
            prev[1], nxt[1]
        ) + 1e-9


# --- round-11 window funnel (end-to-end through load_tables) ----------------

def _minute_events_dir(spark, stub_dir, tmp_path_factory, rows):
    """Like _events_dir but with MINUTE-offset timestamps (the funnel's
    {1h,1d,7d} windows need sub-day resolution); `rows` are
    (user_id, event_type, minute_offset)."""
    import os

    d = tmp_path_factory.mktemp(f"ev{next(_ex_counter)}")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        os.symlink(stub_dir / f"{t}.parquet", d / f"{t}.parquet")
    ev = [
        (
            i,
            _dt.datetime.combine(_D0, _dt.time(0, 0))
            + _dt.timedelta(minutes=int(m)),
            int(uid),
            et,
            1.0,
            None,
        )
        for i, (uid, et, m) in enumerate(rows)
    ]
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),              # user
            st.sampled_from(["view", "click", "purchase"]),     # type
            st.integers(min_value=0, max_value=20000),          # minute
        ),
        min_size=1,
        max_size=30,
    ),
)
@settings(**SETTINGS)
def test_window_funnel_matches_literal(
    spark, stub_dir, tmp_path_factory, rows
):
    """q_window_funnel must, for ANY event sequence, equal the literal
    greedy-from-first-view computation: t0 = first view, t1 = first
    click strictly after t0, t2 = first purchase strictly after t1;
    level 2/3 within W iff t1/t2 <= t0 + W."""
    from nyc_taxi_data_warehouse_spark.queries_nyc import (
        _FUNNEL_WINDOWS_H,
        q_window_funnel,
    )

    sf = _minute_events_dir(spark, stub_dir, tmp_path_factory, rows)
    got = {
        r.window_hours: (r.n_level1, r.n_level2, r.n_level3)
        for r in q_window_funnel(spark, sf).collect()
    }
    by_user: dict[int, dict[str, list[int]]] = {}
    for uid, et, m in rows:
        by_user.setdefault(uid, {}).setdefault(et, []).append(m)
    t012 = {}
    for uid, evs in by_user.items():
        views = sorted(evs.get("view", []))
        if not views:
            continue
        t0 = views[0]
        clicks = sorted(m for m in evs.get("click", []) if m > t0)
        t1 = clicks[0] if clicks else None
        t2 = None
        if t1 is not None:
            purch = sorted(m for m in evs.get("purchase", []) if m > t1)
            t2 = purch[0] if purch else None
        t012[uid] = (t0, t1, t2)
    for w in _FUNNEL_WINDOWS_H:
        n1 = len(t012)
        n2 = sum(
            1 for t0, t1, _ in t012.values()
            if t1 is not None and t1 <= t0 + 60 * w
        )
        n3 = sum(
            1 for t0, t1, t2 in t012.values()
            if t1 is not None and t1 <= t0 + 60 * w
            and t2 is not None and t2 <= t0 + 60 * w
        )
        assert got[w] == (n1, n2, n3), (w, got[w], (n1, n2, n3))


# --- round-11 RAKE keywords (end-to-end through load_tables) -----------------

def _docs_dir(spark, stub_dir, tmp_path_factory, texts):
    """Fresh sf dir with synthetic DOCUMENTS (other tables symlinked)."""
    import os

    d = tmp_path_factory.mktemp(f"doc{next(_ex_counter)}")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        os.symlink(stub_dir / f"{t}.parquet", d / f"{t}.parquet")
    # stub_dir has no events stub (events are normally written fresh)
    spark.createDataFrame(
        [(0, _dt.datetime(2024, 1, 1, 12), 0, "view", 1.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["a", "the", "scan", "join", "sort", "hash", "merge"]
            ),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
)
@settings(**SETTINGS)
def test_rake_keywords_matches_literal(
    spark, stub_dir, tmp_path_factory, texts
):
    """q_rake_keywords must equal the literal RAKE computation for ANY
    corpus over a stopword-bearing alphabet: stopword-delimited phrases,
    word score = round_half_up(degree/freq in micro-units), phrase score
    = exact micro sum, top-10 by (score desc, phrase asc)."""
    import math

    from nyc_taxi_data_warehouse_spark.queries_data import (
        _RAKE_STOPWORDS,
        q_rake_keywords,
    )

    sf = _docs_dir(spark, stub_dir, tmp_path_factory, texts)
    got = [
        (r.phrase, r.n_words, r.n_occur, r.score)
        for r in q_rake_keywords(spark, sf).collect()
    ]
    # literal RAKE
    phrases = []  # (phrase words tuple)
    for t in texts:
        cur = []
        for w in t.split():
            if w in _RAKE_STOPWORDS:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    deg: dict[str, int] = {}
    freq: dict[str, int] = {}
    for p in phrases:
        for w in p:
            deg[w] = deg.get(w, 0) + len(p)
            freq[w] = freq.get(w, 0) + 1
    score_micro = {
        w: math.floor(deg[w] * 1000000.0 / freq[w] + 0.5) for w in deg
    }
    agg: dict[str, list] = {}
    for p in phrases:
        s = " ".join(p)
        sm = sum(score_micro[w] for w in p)
        if s in agg:
            agg[s][1] += 1
        else:
            agg[s] = [len(p), 1, sm]
    exp = sorted(
        ((s, v[0], v[1], v[2]) for s, v in agg.items()),
        key=lambda x: (-x[3], x[0]),
    )[:10]
    exp = [
        (s, nw, no, round(1e-9 + sm / 1e6, 6)) for s, nw, no, sm in exp
    ]
    assert sorted(got) == sorted(exp), (got, exp)
