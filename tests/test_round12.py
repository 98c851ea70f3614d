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


# --- literal-rewrite pins for the round-12 query wave -------------------------

def _lattice_events(spark, sf_dir, types):
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables
    from pyspark.sql import functions as F

    return (
        load_tables(spark, sf_dir)["events"]
        .where(F.col("value").isNotNull() & F.col("event_type").isin(*types))
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("x"),
            "event_id",
        )
        .collect()
    )


def test_welch_ttest_matches_literal(spark, sf_dir):
    """t / df / means must equal the literal float Welch computation on
    the same exact integer sums (tolerance only for the final round)."""
    import math

    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    got = qe.q_welch_ttest(spark, sf_dir).collect()[0]
    rows = _lattice_events(spark, sf_dir, ("purchase", "view"))
    a = [r.x for r in rows if r.event_type == "purchase"]
    b = [r.x for r in rows if r.event_type == "view"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = (sum(x * x for x in a) - sum(a) * ma) / (na - 1)
    vb = (sum(x * x for x in b) - sum(b) * mb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert (got.na, got.nb) == (na, nb)
    assert abs(got.mean_a - ma / 100) < 1e-5
    assert abs(got.t_stat - t) < 1e-5
    assert abs(got.welch_df - df) < 1e-4
    assert got.significant == (abs(got.t_stat) > 1.96)


def test_permutation_test_matches_literal(spark, sf_dir):
    """n_extreme and p must equal a literal Python replay of the B=32
    md5-seeded reallocation replicates."""
    import hashlib

    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    got = qe.q_permutation_test(spark, sf_dir).collect()[0]
    rows = [
        r for r in _lattice_events(spark, sf_dir, ("purchase", "view"))
        if r.event_id is not None
    ]
    n = len(rows)
    na = sum(1 for r in rows if r.event_type == "purchase")
    sa = sum(r.x for r in rows if r.event_type == "purchase")
    s = sum(r.x for r in rows)
    thr = na * 1000000 // n
    d_obs = abs(sa / na - (s - sa) / (n - na))
    extreme = 0
    for rep in range(qe._PERM_B):
        nar = sar = 0
        for r in rows:
            h = int(
                hashlib.md5(
                    f"{r.event_id}#perm{rep}".encode()
                ).hexdigest()[:15],
                16,
            ) % 1000000
            if h < thr:
                nar += 1
                sar += r.x
        if 0 < nar < n and abs(
            sar / nar - (s - sar) / (n - nar)
        ) >= d_obs:
            extreme += 1
    assert got.n_extreme == extreme
    assert abs(got.p_perm - (extreme + 1) / (qe._PERM_B + 1)) < 1e-6
    assert (got.na, got.nb) == (na, n - na)


def _backbone(spark, sf_dir, k):
    """(top-k undirected corridor list, per-zone pickup counts) from the
    staged trips — the shared literal base for the graph-wave pins."""
    from collections import Counter

    from nyc_taxi_data_warehouse_spark.plans import nyc_views, staging
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    li = staging.stg_taxi_trips(
        nyc_views.trips_from_events(load_tables(spark, sf_dir)["events"])
    ).select("pickup_zone_id", "dropoff_zone_id").collect()
    pair_cnt = Counter()
    pick_cnt = Counter()
    for r in li:
        pick_cnt[r.pickup_zone_id] += 1
        a, b = sorted((r.pickup_zone_id, r.dropoff_zone_id))
        if a != b:
            pair_cnt[(a, b)] += 1
    top = sorted(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [p for p, _ in top], pick_cnt


def test_morans_i_matches_literal(spark, sf_dir):
    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    got = qe.q_morans_i(spark, sf_dir).collect()[0]
    und, pick = _backbone(spark, sf_dir, 40)
    both = und + [(b, a) for a, b in und]
    nodes = sorted({a for a, _ in both})
    n = len(nodes)
    x = {z: pick.get(z, 0) for z in nodes}
    s = sum(x.values())
    d = {z: n * x[z] - s for z in nodes}
    num = sum(d[a] * d[b] for a, b in both)
    den = sum(v * v for v in d.values())
    w = len(both)
    assert got.n_nodes == n and got.w_edges == w
    assert abs(got.morans_i - n * num / (w * den)) < 1e-5
    assert abs(got.expected_i - (-1.0 / (n - 1))) < 1e-6


def test_link_prediction_matches_literal(spark, sf_dir):
    """Top-20 non-adjacent pairs by integer AA micro-score, ties (i, j)."""
    import math
    from collections import defaultdict

    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    got = qe.q_link_prediction(spark, sf_dir).collect()
    und, _ = _backbone(spark, sf_dir, 300)
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {z: len(v) for z, v in nbrs.items()}
    edge_set = set(und)
    cand = {}
    for k, kn in nbrs.items():
        for i in kn:
            for j in kn:
                if i < j and (i, j) not in edge_set:
                    cn, aa = cand.get((i, j), (0, 0))
                    # Python round() is banker's; the engines round
                    # half-up — replicate half-up explicitly
                    term = math.floor(1000000.0 / math.log(deg[k]) + 0.5)
                    cand[(i, j)] = (cn + 1, aa + term)
    ranked = sorted(
        cand.items(), key=lambda kv: (-kv[1][1], kv[0][0], kv[0][1])
    )[:20]
    assert len(got) == len(ranked)
    for row, ((i, j), (cn, aa)) in zip(got, ranked):
        assert (row.i, row.j, row.cn, row.aa_micro) == (i, j, cn, aa)
        jac = cn / (deg[i] + deg[j] - cn)
        assert abs(row.jaccard - jac) < 1e-5


def test_item_cf_matches_literal(spark, sf_dir):
    from collections import defaultdict

    from nyc_taxi_data_warehouse_spark import queries_mining as qm
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = qm.q_item_cf(spark, sf_dir).collect()
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id"
    ).collect()
    inter = {
        (r.user_id, (r.user_id * 17 + r.event_id) % 40 + 1)
        for r in ev
        if r.user_id is not None and r.event_id % 53 != 0
    }
    items_by_user = defaultdict(set)
    ni = defaultdict(int)
    for u, it in inter:
        items_by_user[u].add(it)
        ni[it] += 1
    nij = defaultdict(int)
    for items in items_by_user.values():
        s = sorted(items)
        for ii in range(len(s)):
            for jj in range(ii + 1, len(s)):
                nij[(s[ii], s[jj])] += 1
    per_item = defaultdict(list)
    for (i, j), c in nij.items():
        per_item[i].append((j, c))
        per_item[j].append((i, c))
    exp = {}
    for i, cands in per_item.items():
        cands.sort(key=lambda jc: (-(jc[1] * jc[1] / ni[jc[0]]), jc[0]))
        for rank, (j, c) in enumerate(cands[:5], 1):
            exp[(i, j)] = (ni[i], c, rank)
    assert len(got) == len(exp)
    for row in got:
        n_item, n_both, rank = exp[(row.item, row.neighbor)]
        assert (row.n_item, row.n_both, row.rank) == (n_item, n_both, rank)
        cos = n_both / (ni[row.item] * ni[row.neighbor]) ** 0.5
        assert abs(row.cosine - cos) < 1e-5


def test_pii_scan_matches_python_re(spark, sf_dir):
    """Counts, redaction md5, and verdict must match Python's `re` on
    the same planted corpus (the Java/RE2/`re` common-subset contract),
    and every planted slice must actually trigger its detector."""
    import hashlib
    import re

    from nyc_taxi_data_warehouse_spark import queries_data as qd
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = {r.doc_id: r for r in qd.q_pii_scan(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text"
    ).collect()
    for r in docs:
        t = r.text
        if r.doc_id % 7 == 3:
            t += f" contact user{r.doc_id}@example.com"
        if r.doc_id % 11 == 5:
            t += " call 212-555-0147"
        if r.doc_id % 13 == 7:
            t += " ssn 123-45-6789"
        n_email = len(re.findall(qd._PII_EMAIL, t))
        no_ssn = re.sub(qd._PII_SSN, "[SSN]", t)
        n_ssn = len(re.findall(qd._PII_SSN, t))
        n_phone = len(re.findall(qd._PII_PHONE, no_ssn))
        red = re.sub(
            qd._PII_PHONE,
            "[PHONE]",
            re.sub(
                qd._PII_SSN,
                "[SSN]",
                re.sub(qd._PII_EMAIL, "[EMAIL]", t),
            ),
        )
        g = got[r.doc_id]
        assert (g.n_email, g.n_ssn, g.n_phone) == (n_email, n_ssn, n_phone)
        assert g.redacted_hash == hashlib.md5(red.encode()).hexdigest()
        assert g.verdict == (
            "quarantine" if n_email + n_ssn + n_phone > 0 else "keep"
        )
        if r.doc_id % 7 == 3:
            assert g.n_email >= 1
        if r.doc_id % 11 == 5:
            assert g.n_phone >= 1
        if r.doc_id % 13 == 7:
            assert g.n_ssn >= 1


def test_stream_histogram_equals_batch_bins(spark, sf_dir):
    """Stream-kept bin counts must answer the same per-day medians as a
    literal batch recompute (stream ≡ batch for order-insensitive
    sums)."""
    from collections import defaultdict

    from nyc_taxi_data_warehouse_spark import queries_nyc as qn
    from nyc_taxi_data_warehouse_spark.plans import nyc_views
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = {r.day: r for r in qn.q_stream_histogram(spark, sf_dir).collect()}
    w = nyc_views.weather_from_events(
        load_tables(spark, sf_dir)["events"]
    ).select("observed_at", "temp_f").collect()
    bins = defaultdict(lambda: defaultdict(int))
    for r in w:
        if r.observed_at is None or r.temp_f is None:
            continue
        day = r.observed_at.replace(hour=0, minute=0, second=0, microsecond=0)
        import math as _m

        bins[day][(int(_m.floor(r.temp_f * 10 + 0.5)) + 2000) // 50] += 1
    assert set(got) == set(bins)
    for day, bc in bins.items():
        n = sum(bc.values())
        cum = 0
        p50 = None
        for b in sorted(bc):
            cum += bc[b]
            if cum * 2 >= n + 1:
                p50 = b
                break
        g = got[day]
        assert (g.n_rows, g.n_bins, g.p50_bin, g.p50_lo_u) == (
            n, len(bc), p50, p50 * 50 - 2000,
        )


def test_diff_in_diff_matches_literal(spark, sf_dir):
    from nyc_taxi_data_warehouse_spark import queries_eval as qe
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = qe.q_diff_in_diff(spark, sf_dir).collect()[0]
    rows = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts", "value"
    ).collect()
    cells = {}
    for r in rows:
        if r.value is None or r.ts is None:
            continue
        if r.event_type not in ("purchase", "view"):
            continue
        key = (r.event_type == "purchase", r.ts.day > 15)
        n, s = cells.get(key, (0, 0))
        cells[key] = (n + 1, s + round(r.value * 100))
    m = {k: s / n for k, (n, s) in cells.items()}
    did = (m[(True, True)] - m[(True, False)]) - (
        m[(False, True)] - m[(False, False)]
    )
    assert (got.n_tpre, got.n_tpost) == (
        cells[(True, False)][0], cells[(True, True)][0],
    )
    assert abs(got.mean_t_post - m[(True, True)] / 100) < 1e-5
    assert abs(got.did_estimate - did / 100) < 1e-5


def test_ips_eval_matches_literal(spark, sf_dir):
    """IPS/SNIPS/ESS must match the literal per-row importance-weighted
    replay (the per-action fold is algebraically identical)."""
    from collections import Counter

    from nyc_taxi_data_warehouse_spark import queries_eval as qe
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = qe.q_ips_eval(spark, sf_dir).collect()[0]
    rows = [
        r
        for r in load_tables(spark, sf_dir)["events"]
        .select("event_type", "user_id", "value")
        .collect()
        if r.value is not None
        and r.user_id is not None
        and r.event_type is not None
    ]
    n = len(rows)
    n_a = Counter(r.event_type for r in rows)
    sw = swr = sw2 = 0.0
    for r in rows:
        pi = "purchase" if r.user_id % 2 == 0 else "click"
        if r.event_type != pi:
            continue
        w = n / n_a[r.event_type]
        sw += w
        swr += w * round(r.value * 100)
        sw2 += w * w
    assert got.n == n
    # the engine quantizes per-ACTION folds; per-row float replay agrees
    # to well inside the 1e-6-unit lattice at this scale
    assert abs(got.v_ips - swr / n / 100) < 1e-4
    assert abs(got.v_snips - swr / sw / 100) < 1e-4
    assert abs(got.ess - sw * sw / sw2) < 1e-2


def test_getis_ord_matches_literal(spark, sf_dir):
    import math

    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    got = {r.zone: r for r in qe.q_getis_ord(spark, sf_dir).collect()}
    und, pick = _backbone(spark, sf_dir, 40)
    both = und + [(b, a) for a, b in und]
    nodes = sorted({a for a, _ in both})
    n = len(nodes)
    x = {z: pick.get(z, 0) for z in nodes}
    s1 = sum(x.values())
    s2 = sum(v * v for v in x.values())
    assert set(got) == set(nodes)
    for z in nodes:
        nbr = [b for a, b in both if a == z]
        g_i = sum(x[b] for b in nbr) + x[z]
        w_i = len(nbr) + 1
        r = got[z]
        assert (r.x, r.w_i, r.g_i) == (x[z], w_i, g_i)
        if n > w_i and s2 * n > s1 * s1:
            xbar = s1 / n
            sdev = math.sqrt(s2 / n - xbar * xbar)
            zval = (g_i - xbar * w_i) / (
                sdev * math.sqrt((n * w_i - w_i * w_i) / (n - 1))
            )
            assert abs(r.z_score - zval) < 1e-5
            assert r.hot == (abs(r.z_score) > 1.96)
        else:
            assert r.z_score is None and r.hot is None


def test_mcnemar_matches_literal(spark, sf_dir):
    import math

    from nyc_taxi_data_warehouse_spark import queries_eval as qe
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = qe.q_mcnemar(spark, sf_dir).collect()[0]
    rows = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_type"
    ).collect()
    per = {}
    for r in rows:
        if r.ts is None or r.user_id is None:
            continue
        pre, post = per.get(r.user_id, (0, 0))
        if r.event_type == "purchase":
            if r.ts.day <= 15:
                pre = 1
            else:
                post = 1
        per[r.user_id] = (pre, post)
    b = sum(1 for p, q in per.values() if p == 1 and q == 0)
    c = sum(1 for p, q in per.values() if p == 0 and q == 1)
    assert got.n_users == len(per)
    assert (got.pre_only, got.post_only) == (b, c)
    if b + c:
        z = (b - c) / math.sqrt(b + c)
        assert abs(got.chi2 - z * z) < 1e-4
    else:
        assert got.chi2 is None and got.p_value is None


def test_wilcoxon_matches_literal_midranks(spark, sf_dir):
    import math
    from collections import Counter

    from nyc_taxi_data_warehouse_spark import queries_eval as qe
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = qe.q_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    rows = load_tables(spark, sf_dir)["events"].select(
        "ts", "event_type"
    ).collect()
    daily = Counter()
    for r in rows:
        if r.ts is None or r.event_type not in ("view", "click"):
            continue
        daily[(r.ts.date(), r.event_type)] += 1
    days = {d for d, _ in daily}
    ds = [
        daily.get((d, "view"), 0) - daily.get((d, "click"), 0) for d in days
    ]
    ds = [x for x in ds if x != 0]
    n = len(ds)
    # literal midranks over |d| (average of the occupied rank positions)
    order = sorted(abs(x) for x in ds)
    rank_of = {}
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j] == order[i]:
            j += 1
        rank_of[order[i]] = (i + 1 + j) / 2  # mean of ranks i+1..j
        i = j
    w_plus = sum(rank_of[abs(x)] for x in ds if x > 0)
    t = Counter(abs(x) for x in ds)
    tsum = sum(c * c * c - c for c in t.values())
    assert got.n_pairs == n
    assert got.w_plus_doubled == int(round(2 * w_plus))
    assert got.tie_term == tsum
    var = n * (n + 1) * (2 * n + 1) / 24 - tsum / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    assert abs(got.z_score - z) < 1e-5


def test_stream_cdc_equals_batch_compaction(spark, sf_dir):
    """The streaming max-struct upsert view must equal the batch
    apply_changelog compaction exactly (max is order-insensitive, so
    stream ≡ batch for ANY micro-batch slicing)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_taxi_data_warehouse_spark import queries_data as qd
    from nyc_taxi_data_warehouse_spark.operators.merge import apply_changelog
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = {
        r.user_id: (r.last_ts, r.last_value)
        for r in qd.q_stream_cdc(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir)["events"].where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    log = ev.select(
        "user_id", "ts", "event_id",
        (F.col("event_type") == "error").alias("is_delete"), "value",
    )
    exp = {
        r.user_id: (r.ts, r.value)
        for r in apply_changelog(
            log, key=["user_id"], order_by=["ts", "event_id"],
            delete_col="is_delete",
        ).collect()
    }
    assert got == exp


# --- late-wave literal pins ----------------------------------------------------

def test_consistent_hash_minimal_movement(spark, sf_dir):
    """Rendezvous resize S -> S+1: EVERY moved doc moves to the NEW
    shard (existing weights are unchanged, so a doc moves iff the new
    shard's weight wins) — moved_in must be 0 for shards 0..7 — and the
    per-shard counts must match a literal md5-argmax replay."""
    import hashlib

    from nyc_taxi_data_warehouse_spark import queries_data as qd
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = {r.shard: r for r in qd.q_consistent_hash(spark, sf_dir).collect()}
    ids = [
        r.doc_id
        for r in load_tables(spark, sf_dir)["documents"]
        .select("doc_id")
        .collect()
    ]

    def h(doc_id, s):
        return int(
            hashlib.md5(f"{doc_id}#shard{s}".encode()).hexdigest()[:15], 16
        )

    from collections import Counter

    stayed, moved, n_after = Counter(), Counter(), Counter()
    for i in ids:
        hs = [h(i, s) for s in range(9)]
        s8 = max(range(8), key=lambda s: hs[s])
        s9 = max(range(9), key=lambda s: hs[s])
        n_after[s9] += 1
        (stayed if s8 == s9 else moved)[s9] += 1
    assert set(got) == set(n_after)
    for s, r in got.items():
        assert (r.stayed, r.moved_in, r.n_after) == (
            stayed[s], moved[s], n_after[s],
        )
        if s != 8:
            assert r.moved_in == 0  # minimal movement: only the new shard
    assert got[8].n_after == got[8].moved_in  # everything on 8 is new


def test_feature_hash_audit_matches_literal(spark, sf_dir):
    import hashlib
    from collections import Counter

    from nyc_taxi_data_warehouse_spark import queries_data as qd
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = qd.q_feature_hash_audit(spark, sf_dir).collect()[0]
    toks = set()
    for r in load_tables(spark, sf_dir)["documents"].select("text").collect():
        toks.update(t for t in r.text.split() if t)
    bc = Counter(
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 4096
        for t in toks
    )
    collided = sum(c for c in bc.values() if c > 1)
    assert got.n_features == len(toks)
    assert got.buckets_used == len(bc)
    assert got.collision_buckets == sum(1 for c in bc.values() if c > 1)
    assert got.collided_features == collided
    assert got.max_bucket_load == max(bc.values())


def test_time_decay_matches_literal(spark, sf_dir):
    from collections import Counter

    from nyc_taxi_data_warehouse_spark import queries_eval as qe
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = qe.q_time_decay(spark, sf_dir).collect()
    rows = [
        r
        for r in load_tables(spark, sf_dir)["events"]
        .select("user_id", "ts")
        .collect()
        if r.ts is not None and r.user_id is not None
    ]
    ref = max(r.ts.date() for r in rows)
    score, nev = Counter(), Counter()
    for r in rows:
        age = (ref - r.ts.date()).days
        nev[r.user_id] += 1
        if age <= 40:
            score[r.user_id] += 1 << (40 - age)
    exp = sorted(nev, key=lambda u: (-score[u], u))[:20]
    assert [r.user_id for r in got] == exp
    for r in got:
        assert (r.n_events, r.score_u) == (nev[r.user_id], score[r.user_id])


def test_graph_modularity_matches_literal(spark, sf_dir):
    from collections import Counter

    from nyc_taxi_data_warehouse_spark import queries_eval as qe

    got = {r.community: r for r in qe.q_graph_modularity(spark, sf_dir).collect()}
    und, _ = _backbone(spark, sf_dir, 40)
    both = und + [(b, a) for a, b in und]
    lab = _lpa_literal(both, 4)
    m = len(und)
    e_in = Counter()
    for a, b in und:
        if lab[a] == lab[b]:
            e_in[lab[a]] += 1
    d_sum = Counter()
    for a, _b in both:
        d_sum[lab[a]] += 1
    nn = Counter(lab.values())
    assert set(got) == set(nn)
    q_total = 0
    for c in nn:
        term = e_in[c] / m - (d_sum[c] / (2 * m)) ** 2
        q_nano = int(round(term * 1e9))
        r = got[c]
        assert (r.n_nodes, r.e_in, r.d_sum, r.q_nano) == (
            nn[c], e_in[c], d_sum[c], q_nano,
        )
        q_total += q_nano
    assert all(r.q_total_nano == q_total for r in got.values())
    # modularity is bounded in [-1/2, 1]; its SIGN is the finding the
    # query reports (the tiny sf0.001 backbone legitimately lands near
    # zero), so assert the bound, not a direction
    assert -500_000_000 <= q_total <= 1_000_000_000


def test_gdpr_export_matches_literal(spark, sf_dir):
    from collections import Counter

    from nyc_taxi_data_warehouse_spark import queries_data as qd
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = {
        (r.subject_key, r.table_name): r
        for r in qd.q_gdpr_export(spark, sf_dir).collect()
    }
    t = load_tables(spark, sf_dir)
    subs = {
        r.c_custkey
        for r in t["customer"].select("c_custkey").collect()
        if r.c_custkey % 97 == 7
    }
    orders = [
        (r.o_custkey, r.o_orderkey)
        for r in t["orders"].select("o_custkey", "o_orderkey").collect()
        if r.o_custkey in subs
    ]
    okey_to_sub = {ok: ck for ck, ok in orders}
    o_cnt = Counter(ck for ck, _ in orders)
    li_cnt = Counter(
        okey_to_sub[r.l_orderkey]
        for r in t["lineitem"].select("l_orderkey").collect()
        if r.l_orderkey in okey_to_sub
    )
    assert len(got) == 3 * len(subs)
    for s in subs:
        assert got[(s, "customer")].n_rows == 1
        assert got[(s, "orders")].n_rows == o_cnt.get(s, 0)
        assert got[(s, "lineitem")].n_rows == li_cnt.get(s, 0)
