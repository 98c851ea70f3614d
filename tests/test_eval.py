"""Round-9 eval/integrity wave: rank-fold AUC vs a literal replay, PR
sweep confusion identities, lift-table mass conservation, Kruskal–Wallis
vs a Python midrank replay, tau-b pair accounting, Theil–Sen vs the
literal pairwise-median, FK audit on planted orphans, and the
pseudonymization rewrite round-trip."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark import queries_eval as qe


def test_roc_auc_matches_literal_pair_count(spark, sf_dir):
    """AUC must equal the literal P(score+ > score-) + 0.5*P(tie) over
    all (pos, neg) pairs, per source — the definition the rank fold
    compresses."""
    rows = {r.source: r for r in qe.q_roc_auc(spark, sf_dir).collect()}
    base = qe._scored(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in base:
        by_src.setdefault(r.source, []).append((r.pi, r.y))
    for src, items in by_src.items():
        pos = [pi for pi, y in items if y == 1]
        neg = [pi for pi, y in items if y == 0]
        got = rows[src]
        assert got.n == len(items)
        assert got.n_pos == len(pos) and got.n_neg == len(neg)
        if not pos or not neg:
            assert got.auc is None
            continue
        wins = sum(1 for p in pos for q in neg if p > q)
        ties = sum(1 for p in pos for q in neg if p == q)
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert math.isclose(got.auc, auc, abs_tol=1e-6), src


def test_pr_curve_confusion_identities(spark, sf_dir):
    """tp+fn is the positive total at every threshold; tp and tp+fp are
    non-increasing in the threshold; recall is non-increasing."""
    rows = sorted(
        qe.q_pr_curve(spark, sf_dir).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert [r.threshold_pct for r in rows] == [5 * i for i in range(1, 20)]
    n_pos = rows[0].tp + rows[0].fn
    prev_tp = prev_pred = None
    for r in rows:
        assert r.tp + r.fn == n_pos
        pred = r.tp + r.fp
        if prev_tp is not None:
            assert r.tp <= prev_tp and pred <= prev_pred
        prev_tp, prev_pred = r.tp, pred
        if r.recall is not None:
            assert math.isclose(r.recall, r.tp / n_pos, abs_tol=1e-6)


def test_lift_table_mass_and_gain(spark, sf_dir):
    """Decile rows partition the corpus (Σn_d = n, Σpos_d = n_pos), the
    cumulative gain ends at 1, and every tie stays in one decile (the
    decile of a distinct score's first-from-top position)."""
    rows = sorted(qe.q_lift_table(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    base = qe._scored(spark, sf_dir).collect()
    assert sum(r.n_d for r in rows) == len(base)
    assert sum(r.pos_d for r in rows) == sum(r.y for r in base)
    assert rows[-1].cum_pos == sum(r.y for r in base)
    if rows[-1].cum_gain is not None:
        assert math.isclose(rows[-1].cum_gain, 1.0, abs_tol=1e-6)
    assert all(0 <= r.decile <= 9 for r in rows)


def test_kruskal_wallis_matches_midrank_replay(spark, sf_dir):
    """H (pre-quantization) replayed in Python with literal midranks
    must match the BIGINT micro-unit fold to the quantization error
    (≤ k·1e-6 on the Σterm, ×12 on H)."""
    got = qe.q_kruskal_wallis(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    vals = [
        (r.event_type, int(round(r.value * 100)))
        for r in ev.select("event_type", "value").collect()
    ]
    n = len(vals)
    all_x = sorted(x for _, x in vals)
    # midrank per distinct value
    from collections import Counter

    cnt = Counter(all_x)
    cle, mid = 0, {}
    for v in sorted(cnt):
        c = cnt[v]
        cle += c
        mid[v] = cle - (c - 1) / 2.0
    groups: dict[str, list] = {}
    for g, x in vals:
        groups.setdefault(g, []).append(x)
    assert got.k == len(groups) and got.n == n
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(mid[x] for x in xs)) ** 2 / len(xs) for xs in groups.values()
    ) - 3.0 * (n + 1)
    tsum = sum(c**3 - c for c in cnt.values())
    h_adj = h / (1.0 - tsum / (n**3 - n))
    assert math.isclose(got.h_adj, h_adj, abs_tol=2e-4), (got.h_adj, h_adj)
    assert 0.0 <= got.p <= 1.0


def test_kendall_tau_pair_accounting(spark, sf_dir):
    """n0 = n(n-1)/2 and nc+nd+ties partitions the pairs; tau_b in
    [-1, 1]."""
    got = qe.q_kendall_tau(spark, sf_dir).collect()[0]
    assert got.n0 == got.n_days * (got.n_days - 1) // 2
    both = got.tx_p + got.ty_p  # pairs tied in x plus tied in y (may overlap)
    assert got.nc + got.nd <= got.n0
    assert got.n0 - (got.nc + got.nd) <= both
    if got.tau_b is not None:
        assert -1.0 <= got.tau_b <= 1.0


def test_theil_sen_matches_literal_median(spark, sf_dir):
    """Slope must be the literal lower median of all pairwise slopes on
    the same 1e-9 lattice; intercept the lower median of residuals."""
    got = qe.q_theil_sen(spark, sf_dir).collect()[0]
    daily = sorted(
        (r.t, r.y)
        for r in qe._daily_xy(spark, sf_dir)
        .select(
            F.datediff(F.col("day"), F.lit("1970-01-01")).alias("t"), "y"
        )
        .collect()
    )
    slopes = sorted(
        round((y2 - y1) / float(t2 - t1) + 1e-9, 9)
        for i, (t1, y1) in enumerate(daily)
        for (t2, y2) in daily[i + 1:]
    )
    assert got.n_pairs == len(slopes)
    lower_med = slopes[(len(slopes) - 1) // 2]
    assert got.slope == lower_med
    resid = sorted(round(y - got.slope * t + 1e-9, 9) for t, y in daily)
    assert got.intercept == resid[(len(resid) - 1) // 2]


def test_fk_audit_counts_planted_orphans(spark, sf_dir, tmp_path):
    """On the shipped TPC-H-ish data every edge must be orphan-free; on
    a planted-orphan copy the audit must count exactly the plants."""
    rows = {r.edge: r for r in qe.q_fk_audit(spark, sf_dir).collect()}
    assert len(rows) == len(qe._FK_EDGES)
    for r in rows.values():
        assert r.orphan_keys == 0 and r.orphan_rows == 0
    # plant: copy nation with 2 bogus region keys
    d = str(tmp_path)
    spark.read.parquet(f"{sf_dir}/nation.parquet").withColumn(
        "n_regionkey",
        F.when(F.col("n_nationkey") < 2, F.col("n_regionkey") + 1000)
        .otherwise(F.col("n_regionkey")),
    ).write.mode("overwrite").parquet(f"{d}/nation.parquet")
    # region must copy in FULL (it is the audited edge's parent); the
    # unrelated tables can be 1-row stubs — their edges aren't asserted
    spark.read.parquet(f"{sf_dir}/region.parquet").write.mode(
        "overwrite"
    ).parquet(f"{d}/region.parquet")
    for t in ("customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    planted = {
        r.edge: r for r in qe.q_fk_audit(spark, d).collect()
    }["nation.n_regionkey->region.r_regionkey"]
    assert planted.orphan_rows == 2


def test_pseudonymize_rewrite_roundtrip(spark, sf_dir):
    """The reported md5 must equal a literal Python rewrite of the same
    token stream, and n_replaced the literal vocab hit count."""
    got = {
        r.doc_id: r
        for r in qe.q_pseudonymize(spark, sf_dir).limit(2000).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    vocab = set(qe._PSEUDO_VOCAB)
    checked = 0
    for r in docs:
        if r.doc_id not in got:
            continue
        toks = [t for t in r.text.split() if t]
        repl = [
            "ENT_" + hashlib.md5(t.encode()).hexdigest()[:8]
            if t in vocab else t
            for t in toks
        ]
        g = got[r.doc_id]
        assert g.n_tokens == len(toks)
        assert g.n_replaced == sum(1 for t in toks if t in vocab)
        assert g.pseudo_md5 == hashlib.md5(
            " ".join(repl).encode()
        ).hexdigest()
        checked += 1
    assert checked > 0
    assert any(g.n_replaced > 0 for g in got.values())


def test_dp_histogram_noise_is_seeded_and_bounded(spark, sf_dir):
    """Two runs must be bit-identical (seeded mechanism), noisy counts
    non-negative, and abs_err consistent with the released value when
    the clamp didn't bite."""
    a = sorted(qe.q_dp_histogram(spark, sf_dir).collect())
    b = sorted(qe.q_dp_histogram(spark, sf_dir).collect())
    assert a == b
    for r in a:
        assert r.noisy_n >= 0
        if r.noisy_n > 0:
            assert abs(r.noisy_n - r.n) == r.abs_err


def test_partition_advisor_verdict_thresholds(spark, sf_dir):
    rows = {r.candidate: r for r in
            qe.q_partition_advisor(spark, sf_dir).collect()}
    assert set(rows) == {"event_type", "day", "user_id"}
    for r in rows.values():
        if r.n_values < 10:
            assert r.verdict == "TOO_COARSE"
        elif r.n_values > 10000:
            assert r.verdict == "BUCKET"
        elif r.max_rows * r.n_values > 10 * r.n_rows:
            assert r.verdict == "SALT"
        else:
            assert r.verdict == "PARTITION"


def test_zorder_effect_skipping_wins(spark, sf_dir):
    """Z-order must never scan more files than linear on the 2-D
    rectangle predicates, and must strictly win on at least one; file
    masses reconcile per layout."""
    rows = sorted(qe.q_zorder_effect(spark, sf_dir).collect(),
                  key=lambda r: r.pred_id)
    assert [r.pred_id for r in rows] == [p[0] for p in qe._ZE_PREDS]
    wins = 0
    for r in rows:
        assert 0 <= r.files_zorder <= 64 and 0 <= r.files_linear <= 64
        # the x-only band (pred 2) favors linear; the 2-D rectangles
        # must not: z-order bounded rectangles prune on BOTH dims
        if r.pred_id in (1, 4, 5) and r.files_zorder < r.files_linear:
            wins += 1
        assert r.rows_zorder >= 0 and r.rows_linear >= 0
    assert wins >= 1, [(r.pred_id, r.files_linear, r.files_zorder)
                       for r in rows]


def test_vacuum_plan_reference_model(spark, sf_dir):
    """Replay the TTL reference model literally in Python: every file's
    ref count, last ref, and deletable flag must match."""
    import datetime as dt

    rows = {r.day: r for r in qe.q_vacuum_plan(spark, sf_dir).collect()}
    days = sorted(rows)
    head = max(days)
    snaps = sorted({d - dt.timedelta(days=d.weekday()) for d in days})
    for d, r in rows.items():
        refs = [s for s in snaps
                if d <= s < d + dt.timedelta(days=qe._VACUUM_FILE_TTL_DAYS)]
        assert r.n_refs == len(refs), d
        assert r.last_ref == (max(refs) if refs else None)
        expect = bool(refs) and max(refs) < head - dt.timedelta(
            days=qe._VACUUM_KEEP_DAYS
        )
        assert r.deletable == int(expect), d
    # the model must exercise both outcomes on a multi-month calendar
    if (head - min(days)).days > 60:
        flags = {r.deletable for r in rows.values()}
        assert flags == {0, 1}


def test_bloom_sizing_formula(spark, sf_dir):
    """m/k must match the textbook optimum computed in Python, and more
    keys / tighter fpp must never shrink the filter."""
    import math

    rows = qe.q_bloom_sizing(spark, sf_dir).collect()
    assert len(rows) == 3 * len(qe._BLOOM_FPP)
    for r in rows:
        m = math.ceil(-r.n * math.log(r.p) / (math.log(2.0) ** 2))
        k = max(1, round(m / r.n * math.log(2.0)))
        assert r.m_bits == m and r.k_hashes == k, r
        assert r.kib == math.ceil(m / 8192.0)
    by_col = {}
    for r in rows:
        by_col.setdefault(r.key_col, {})[r.p] = r.m_bits
    for col, d in by_col.items():
        ps = sorted(d, reverse=True)
        assert d[ps[0]] <= d[ps[-1]], col  # tighter fpp -> more bits


def test_ndcg_mrr_matches_literal_ranking(spark, sf_dir):
    """Replay ranking + nDCG@10 + MRR literally in Python from the
    candidate frame: metrics must match to the nano-quantization."""
    got = {r.qid: r for r in qe.q_ndcg_mrr(spark, sf_dir).collect()}
    assert set(got) == {q for q, _, _ in qe._IR_QUERIES}
    # rebuild candidates exactly as the query does (score in micro-units)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    toks = {r.doc_id: [t for t in r.text.split() if t] for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n_docs
    all_terms = {t for _, a, b in qe._IR_QUERIES for t in (a, b)}
    tf = {}
    for d, w in toks.items():
        for t in w:
            if t in all_terms:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    import math

    def c_micro(d, t):
        idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        dl = len(toks[d])
        v = idf * (tf[(d, t)] * 2.2) / (
            tf[(d, t)] + 1.2 * (0.25 + 0.75 * dl / avgdl)
        )
        return round(v * 1e6)

    for qid, t1, t2 in qe._IR_QUERIES:
        cand = {}
        for d in toks:
            terms = [t for t in (t1, t2) if (d, t) in tf]
            if terms:
                cand[d] = (sum(c_micro(d, t) for t in terms), len(terms))
        ranked = sorted(cand.items(), key=lambda kv: (-kv[1][0], kv[0]))
        top = ranked[: qe._IR_K]
        dcg = sum(
            round((3 if rel >= 2 else 1) * 1e9
                  / (math.log(i + 2) / math.log(2.0)))
            for i, (_, (_, rel)) in enumerate(top)
        )
        n2 = sum(1 for _, (_, r) in cand.items() if r >= 2)
        n1 = sum(1 for _, (_, r) in cand.items() if r == 1)
        idcg = sum(
            round((3 if i < min(10, n2)
                   else (1 if i < min(10, n2 + n1) else 0)) * 1e9
                  / (math.log(i + 2) / math.log(2.0)))
            for i in range(qe._IR_K)
        )
        g = got[qid]
        assert g.n_candidates == len(cand) and g.n2 == n2 and g.n1 == n1
        best = next(
            (i + 1 for i, (_, (_, rel)) in enumerate(top) if rel >= 2), None
        )
        assert g.best_rank2 == best
        if idcg:
            assert math.isclose(g.ndcg10, dcg / idcg, abs_tol=1e-5), qid


def test_rtbf_plan_accounting(spark, sf_dir):
    """Totals reconcile: touched <= total partitions, rewritten >=
    deleted, amplification = rewritten/deleted."""
    import math

    rows = {r.table_name: r for r in qe.q_rtbf_plan(spark, sf_dir).collect()}
    assert set(rows) == {"events", "orders"}
    for r in rows.values():
        assert 0 <= r.partitions_touched <= r.partitions_total
        assert r.rows_to_delete <= r.rows_rewritten <= r.total_rows
        if r.rows_to_delete:
            assert math.isclose(
                r.amplification, r.rows_rewritten / r.rows_to_delete,
                abs_tol=1e-6,
            )


def test_knn_classify_fold_and_majority(spark, sf_dir):
    """Fold accounting (every fold member classified exactly once) and a
    literal numpy majority-vote replay must match."""
    import numpy as np

    rows = {r.true_label: r
            for r in qe.q_knn_classify(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    fold = sorted(v for v in vecs if v % qe._KNN_FOLD == 0)
    train = sorted(v for v in vecs if v % qe._KNN_FOLD != 0)
    assert sum(r.n_queries for r in rows.values()) == len(fold)
    correct = {0: 0, 1: 0, 2: 0}
    totals = {0: 0, 1: 0, 2: 0}
    tm = np.stack([vecs[t] / np.linalg.norm(vecs[t]) for t in train])
    for q in fold:
        qv = vecs[q] / np.linalg.norm(vecs[q])
        sims = tm @ qv
        order = sorted(range(len(train)), key=lambda i: (-sims[i], train[i]))
        top = [train[i] for i in order[: qe._KNN_K]]
        votes = {}
        for t in top:
            votes[t % qe._KNN_CLASSES] = votes.get(t % qe._KNN_CLASSES, 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lbl = q % qe._KNN_CLASSES
        totals[lbl] += 1
        correct[lbl] += int(pred == lbl)
    for lbl, r in rows.items():
        assert r.n_queries == totals[lbl]
        assert r.n_correct == correct[lbl], lbl


def test_survival_km_matches_literal_product_limit(spark, sf_dir):
    """Replay the KM product-limit literally in Python from per-user
    durations: n_risk/d/censored and S(t) must match (to the nano
    quantization)."""
    import datetime as dt
    import math

    rows = sorted(qe.q_survival_km(spark, sf_dir).collect(),
                  key=lambda r: r.t)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("user_id", "event_type", F.to_date("ts").alias("day")).collect()
    first_view, first_buy, horizon = {}, {}, dt.date.min
    for r in ev:
        horizon = max(horizon, r.day)
        if r.event_type == "view":
            if r.user_id not in first_view or r.day < first_view[r.user_id]:
                first_view[r.user_id] = r.day
        if r.event_type == "purchase":
            if r.user_id not in first_buy or r.day < first_buy[r.user_id]:
                first_buy[r.user_id] = r.day
    durs = []
    for u, fv in first_view.items():
        fb = first_buy.get(u)
        if fb is not None and fb >= fv:
            durs.append(((fb - fv).days, 1))
        else:
            durs.append(((horizon - fv).days, 0))
    from collections import Counter

    d_t = Counter(t for t, e in durs if e)
    n_t = Counter(t for t, _ in durs)
    n = len(durs)
    s, at_risk = 1.0, n
    expect = {}
    for t in sorted(n_t):
        d = d_t.get(t, 0)
        if d:
            s *= 1.0 - d / at_risk
        expect[t] = (at_risk, d, n_t[t] - d, s)
        at_risk -= n_t[t]
    assert [r.t for r in rows] == sorted(n_t)
    for r in rows:
        nr, d, c, s_exp = expect[r.t]
        assert (r.n_risk, r.d, r.censored) == (nr, d, c), r.t
        assert math.isclose(r.s_km, s_exp, abs_tol=1e-5), (r.t, r.s_km, s_exp)
    # curve is non-increasing
    vals = [r.s_km for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


def test_kcore_matches_literal_peel_and_fixpoint(spark, sf_dir):
    """Replay the backbone build + 8-round peel literally; a 9th round
    must change nothing (fixpoint reached within the unroll)."""
    from collections import Counter

    from nyc_taxi_data_warehouse_spark.plans import nyc_views, staging
    from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables

    got = {r.zone_id: r.core_degree
           for r in qe.q_kcore(spark, sf_dir).collect()}
    li = staging.stg_taxi_trips(
        nyc_views.trips_from_events(load_tables(spark, sf_dir)["events"])
    )
    cnt = (
        li.select(F.least("pickup_zone_id", "dropoff_zone_id").alias("a"),
                  F.greatest("pickup_zone_id", "dropoff_zone_id").alias("b"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b").count().collect()
    )
    tc = sum(r["count"] for r in cnt)
    ne = len(cnt)
    edges = {(r.a, r.b) for r in cnt if r["count"] * ne > tc}
    nodes = {x for e in edges for x in e}
    prev = None
    for _ in range(qe._KCORE_ROUNDS + 1):  # +1 proves the fixpoint
        deg = Counter()
        for a, b in edges:
            if a in nodes and b in nodes:
                deg[a] += 1
                deg[b] += 1
        prev = set(nodes)
        nodes = {n for n in nodes if deg[n] >= qe._KCORE_K}
    assert nodes == prev, "peel did not reach fixpoint within the unroll"
    deg = Counter()
    for a, b in edges:
        if a in nodes and b in nodes:
            deg[a] += 1
            deg[b] += 1
    assert got == {n: 1 * deg[n] for n in nodes}
