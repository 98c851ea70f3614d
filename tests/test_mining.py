"""Round-8 mining wave: CUSUM prefix identity, quantile-summary error
bound, entity-resolution score structure, sequence-mining mass law."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark import queries_mining as qm


def test_cusum_prefix_identity_matches_recurrence(spark, sf_dir):
    """The window formulation S_t = P_t - min(0, min prefix P) must equal
    the literal CUSUM recurrence S_t = max(0, S_{t-1} + d_t) replayed in
    Python over the same integer deviations, for every type and day."""
    out = {
        (r.event_type, r.day): (r.cusum_up, r.cusum_dn)
        for r in qm.q_cusum_changepoint(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.y))
    for et, rows in series.items():
        rows.sort()
        total = sum(y for _, y in rows)
        n_days = len(rows)
        allow = total // 10
        s_up = s_dn = 0
        for day, y in rows:
            s_up = max(0, s_up + (n_days * y - total - allow))
            s_dn = max(0, s_dn + (total - n_days * y - allow))
            assert out[(et, day)] == (s_up, s_dn), (et, day)


def test_quantile_summary_rank_error_bound(spark, sf_dir):
    """Merged-summary answers must overshoot the target rank by at most
    the theoretical bound sum_s ceil(n_s/G), never undershoot, and the
    estimated value can never be below the exact type-1 quantile."""
    rows = qm.q_quantile_summary(spark, sf_dir).collect()
    assert len(rows) == len(qm._QS_TARGETS)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    # bound with perfectly even shards is S*ceil(n/(S*G)); allow the
    # worst case over actual shard sizes by using ceil per shard of the
    # maximum possible shard (n): sum_s ceil(n_s/G) <= n/G + S
    bound = n // qm._QS_GRID + qm._QS_SHARDS
    for r in rows:
        assert r.est_rank >= r.target_rank
        assert r.rank_err == r.est_rank - r.target_rank
        assert r.rank_err <= bound, (r.q_mille, r.rank_err, bound)
        assert r.est_val >= r.exact_val
        assert r.n == n


def test_entity_resolution_truth_accounting(spark, sf_dir):
    """Planted-twin bookkeeping: tp+fn across nations equals the number
    of planted twins, fn equals the heavy twins (balance gate rejects
    exactly those), and recall is strictly below 1 where a heavy twin
    exists."""
    rows = qm.q_entity_resolution(spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_twins = cust.where(F.col("c_custkey") % 3 == 0).count()
    n_heavy = cust.where(F.col("c_custkey") % 6 == 0).count()
    assert sum(r.tp + r.fn for r in rows) == n_twins
    assert sum(r.fn for r in rows) == n_heavy
    for r in rows:
        assert 0 <= r.tp <= r.n_matched
        if r.precision is not None:
            assert 0.0 <= r.precision <= 1.0
        if r.recall is not None:
            assert 0.0 <= r.recall <= 1.0


def test_frequent_sequences_mass_conservation(spark, sf_dir):
    """Total trigram mass = sum over users of max(0, n_events - 2); the
    reported share column must equal support/total for every pattern."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    total = sum(max(0, r.c - 2) for r in per_user.collect())
    rows = qm.q_frequent_sequences(spark, sf_dir).collect()
    assert rows, "threshold filtered everything out"
    for r in rows:
        assert r.support * 200 >= total
        assert math.isclose(
            r.share, round(1e-9 + r.support / total, 6), abs_tol=1e-9
        )


def test_stream_cusum_matches_batch_chart(spark, sf_dir):
    """The streamed daily grain must reproduce the batch chart exactly:
    cusum_up/alarm_up agree per (type, date) with q_cusum_changepoint."""
    batch = {
        (r.event_type, r.day): (r.cusum_up, r.alarm_up)
        for r in qm.q_cusum_changepoint(spark, sf_dir).collect()
    }
    streamed = qm.q_stream_cusum(spark, sf_dir).collect()
    assert len(streamed) == len(batch)
    for r in streamed:
        assert batch[(r.event_type, r.day.date())] == (
            r.cusum_up,
            r.alarm_up,
        ), (r.event_type, r.day)


def test_gaps_islands_mass_conservation(spark, sf_dir):
    """Every event belongs to exactly one island: sum(run_len *
    n_islands) over the histogram equals the filtered event count."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    total = ev.count()
    rows = qm.q_gaps_islands(spark, sf_dir).collect()
    assert sum(r.run_len * r.n_islands for r in rows) == total
    assert all(r.run_len >= 1 and r.n_islands >= 1 for r in rows)


def test_compaction_plan_partitions_all_rows(spark, sf_dir):
    """The plan covers every order exactly once, uses at most the
    configured bin count, and closes every non-final bin at >= 100 %
    of target (next-fit closes a bin only once the target is crossed)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = orders.count()
    rows = sorted(
        qm.q_compaction_plan(spark, sf_dir).collect(),
        key=lambda r: r.bin_id,
    )
    assert sum(r.bin_rows for r in rows) == total
    assert rows[0].bin_id >= 0
    assert rows[-1].bin_id < qm._COMPACT_BINS
    # bin ids are dense: `before div target` can only advance by one
    # boundary at a time when files are smaller than the target, so the
    # plan never skips a bin
    assert [r.bin_id for r in rows] == list(range(len(rows)))


def test_bh_fdr_adjustment_replay(spark, sf_dir):
    """Replaying the BH step-up procedure in Python over the query's own
    p-values must reproduce p_adj exactly, and the rejected set must be
    a prefix of the p-sorted order (the step-up property)."""
    rows = qm.q_bh_fdr(spark, sf_dir).collect()
    m = len(rows)
    srt = sorted(rows, key=lambda r: (r.p, r.event_type, r.weekday))
    padj, run = [], float("inf")
    for i in range(m - 1, -1, -1):
        run = min(run, srt[i].p * m / (i + 1))
        padj.append(min(1.0, run))
    padj.reverse()
    for r, expect in zip(srt, padj):
        assert abs(r.p_adj - round(1e-9 + expect, 10)) < 1e-12
    flags = [r.rejected for r in srt]
    assert flags == sorted(flags, reverse=True), "rejections not a prefix"


def test_mannwhitney_against_bruteforce_ranks(spark, sf_dir):
    """2U and the tie sum must match a literal midrank computation over
    the collected values (small at the test SF)."""
    from collections import Counter

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    data = ev.select("event_type", "value", "user_id").collect()
    by_type: dict[str, list] = {}
    for r in data:
        by_type.setdefault(r.event_type, []).append(
            (r.value, r.user_id % 2)
        )
    out = {r.event_type: r for r in qm.q_mannwhitney(spark, sf_dir).collect()}
    for et, vals in by_type.items():
        counts = Counter(v for v, _ in vals)
        svals = sorted(counts)
        cum, midrank2 = 0, {}
        tsum = 0
        for v in svals:
            c = counts[v]
            midrank2[v] = 2 * cum + c + 1  # doubled midrank
            cum += c
            tsum += c * c * c - c
        two_r_a = sum(midrank2[v] for v, va in vals if va == 0)
        n_a = sum(1 for _, va in vals if va == 0)
        r = out[et]
        assert r.n_a == n_a
        assert r.two_u == two_r_a - n_a * (n_a + 1)
        assert r.n == cum if hasattr(r, "n") else True
        assert abs(r.p) <= 1.0


def test_slo_burn_percentiles_match_sorted_selection(spark, sf_dir):
    """p50/p95 must be the literal type-1 selections from each day's
    sorted values, and viol_7d must equal the trailing-7 violation sum."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    data = ev.select(F.to_date("ts").alias("day"), "value").collect()
    per_day: dict = {}
    for r in data:
        per_day.setdefault(r.day, []).append(r.value)
    rows = sorted(qm.q_slo_burn(spark, sf_dir).collect(), key=lambda r: r.day)
    flags = []
    for r in rows:
        vals = sorted(per_day[r.day])
        n = len(vals)
        assert r.n == n
        assert r.p50 == vals[-(-50 * n // 100) - 1]
        assert r.p95 == vals[-(-95 * n // 100) - 1]
        flags.append(r.violated)
        assert r.viol_7d == sum(flags[-7:])
        assert r.burn_alert == int(r.viol_7d >= 3)


def test_calibration_bins_account_for_every_doc(spark, sf_dir):
    """Bin populations must cover the corpus, observed rates stay in
    [0,1], and each bin's mean_p lies inside its nominal bin range
    (within rounding slack)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.count()
    rows = qm.q_calibration(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert 0.0 <= r.obs_rate <= 1.0
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.0
        assert lo - 1e-6 <= r.mean_p <= hi + 1e-6, (r.bin, r.mean_p)
        assert abs(r.gap - round(1e-9 + abs(r.mean_p - r.obs_rate), 6)) < 2e-6


def test_boilerplate_scrub_reconstruction(spark, sf_dir):
    """A document with nothing removed must hash to its own re-segmented
    text, and n_removed must equal the count of its corpus-frequent
    segments (replayed in Python)."""
    import hashlib
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    segs_by_doc = {}
    for r in docs:
        toks = [t for t in r.text.split() if t]
        segs = [
            " ".join(toks[i : i + 3]) for i in range(0, len(toks), 3)
        ]
        segs_by_doc[r.doc_id] = segs
    n_docs = len(docs)
    df = Counter()
    for segs in segs_by_doc.values():
        for s in set(segs):
            df[s] += 1
    frequent = {s for s, d in df.items() if d * 20 >= n_docs}
    out = {
        r.doc_id: r
        for r in qm.q_boilerplate_scrub(spark, sf_dir).collect()
    }
    for doc_id, segs in segs_by_doc.items():
        r = out[doc_id]
        assert r.n_segs == len(segs)
        kept = [s for s in segs if s not in frequent]
        assert r.n_removed == len(segs) - len(kept)
        expect = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert r.clean_md5 == expect, doc_id


def test_dup_span_removal_replay(spark, sf_dir):
    """Full Python replay: first occurrence of every repeated 5-token
    span survives, every other occurrence is cut, and the rewritten
    text's md5 matches per document."""
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    spans_by_doc = {}
    for r in docs:
        toks = [t for t in r.text.split() if t]
        spans_by_doc[r.doc_id] = [
            " ".join(toks[i : i + 5]) for i in range(0, len(toks), 5)
        ]
    first = {}
    for doc_id in sorted(spans_by_doc):
        for sid, s in enumerate(spans_by_doc[doc_id]):
            key = (doc_id, sid)  # lexicographic — no packed-int collision
            if s not in first or key < first[s]:
                first[s] = key
    out = {
        r.doc_id: r for r in qm.q_dup_span_removal(spark, sf_dir).collect()
    }
    total_removed = 0
    for doc_id, spans in spans_by_doc.items():
        kept = [
            s
            for sid, s in enumerate(spans)
            if first[s] == (doc_id, sid)
        ]
        r = out[doc_id]
        assert r.n_spans == len(spans)
        assert r.n_removed == len(spans) - len(kept)
        total_removed += r.n_removed
        assert r.clean_md5 == hashlib.md5(
            " ".join(kept).encode()
        ).hexdigest(), doc_id
    # the corpus genuinely contains repeated spans at every SF
    assert total_removed > 0


def test_encoding_advisor_accounting(spark, sf_dir):
    """Every advised column reports the full row count, n_runs < n_rows,
    the ratio is consistent, and the recommendation follows the stated
    integer thresholds."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    rows = qm.q_encoding_advisor(spark, sf_dir).collect()
    assert {r.column_name for r in rows} == set(qm._ENC_COLS)
    for r in rows:
        assert r.n_rows == n  # no nulls in the synthetic fact
        assert 0 <= r.n_runs < r.n_rows
        assert abs(r.run_ratio - round(1e-9 + r.n_runs / r.n_rows, 6)) < 1e-9
        if r.n_distinct * 20 <= r.n_rows:
            assert r.encoding == "DICTIONARY"
        elif r.n_runs * 2 >= r.n_rows:
            assert r.encoding == "RLE"
        else:
            assert r.encoding == "PLAIN"


def test_matryoshka_recall_monotone_in_prefix_width(spark, sf_dir):
    """Recall must be a proper rational in [0,1], full-width self-recall
    logic must hold (hits <= n_queries*k), and wider prefixes should not
    be dramatically worse than narrow ones on this corpus (sanity, not
    theory: MRL recall is typically monotone; assert the 32-dim prefix
    beats or ties the 8-dim one)."""
    rows = {r.prefix_dims: r for r in qm.q_matryoshka_recall(spark, sf_dir).collect()}
    assert set(rows) == set(qm._MRL_PREFIXES)
    for r in rows.values():
        assert 0 <= r.n_hits <= r.n_queries * r.k
        assert abs(
            r.recall_at_k - round(1e-9 + r.n_hits / (r.n_queries * r.k), 6)
        ) < 1e-9
    assert rows[32].n_hits >= rows[8].n_hits


def test_spearman_matches_python_replay(spark, sf_dir):
    """Spearman/Pearson must match a literal midrank + closed-form
    replay over the collected daily grain."""
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "view").cast("long")).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    xs = [r.x for r in daily]
    ys = [r.y for r in daily]

    def mid2(vals):
        s = sorted(vals)
        return {
            v: 2 * (len([u for u in s if u <= v])) - s.count(v) + 1
            for v in set(vals)
        }

    mx, my = mid2(xs), mid2(ys)
    a = [mx[v] for v in xs]
    b = [my[v] for v in ys]

    def rho(a, b):
        n = len(a)
        num = n * sum(p * q for p, q in zip(a, b)) - sum(a) * sum(b)
        den = math.sqrt(
            (n * sum(p * p for p in a) - sum(a) ** 2)
            * (n * sum(q * q for q in b) - sum(b) ** 2)
        )
        return num / den

    r = qm.q_spearman(spark, sf_dir).collect()[0]
    assert r.n == len(xs)
    assert abs(r.spearman_rho - round(1e-9 + rho(a, b), 6)) < 1e-6
    assert abs(r.pearson_rho - round(1e-9 + rho(xs, ys), 6)) < 1e-6
