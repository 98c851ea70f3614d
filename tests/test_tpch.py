"""Semantic invariants for the TPC-H analog wave (queries_tpch.py).

Cross-engine value parity is the oracle gate's job (tools/
check_correctness.py); these tests pin the *semantics* each query shape
claims — semi-joins don't multiply, histograms partition the domain,
ratios stay in range, integer-space membership rules equal their float
definitions — so an oracle-and-query-drift-together regression can't
slip through.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark import queries_tpch as qt
from nyc_taxi_data_warehouse_spark.plans import nyc_views


def test_q4_semi_join_counts_orders_at_most_once(spark, sf_dir):
    out = qt.q_tpch_q4(spark, sf_dir).collect()
    t = nyc_views.load_tables(spark, sf_dir)
    in_window = (
        t["orders"]
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .count()
    )
    assert sum(r.order_count for r in out) <= in_window
    assert all(r.order_count > 0 for r in out)


def test_q13_histogram_partitions_customers(spark, sf_dir):
    out = qt.q_tpch_q13(spark, sf_dir).collect()
    t = nyc_views.load_tables(spark, sf_dir)
    assert sum(r.custdist for r in out) == t["customer"].count()
    # the outer join must keep zero-order customers distinguishable:
    # every c_count bucket is distinct and non-negative
    counts = [r.c_count for r in out]
    assert len(counts) == len(set(counts))
    assert min(counts) >= 0


def test_q14_ratio_bounded(spark, sf_dir):
    row = qt.q_tpch_q14(spark, sf_dir).collect()[0]
    assert 0.0 <= row.promo_revenue_pct <= 100.0
    assert row.total_revenue > 0


def test_q15_all_rows_achieve_the_same_max(spark, sf_dir):
    rows = qt.q_tpch_q15(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_q17_integer_membership_equals_float_rule(spark, sf_dir):
    """qty_u·5·n < sum_u must select exactly the rows with
    l_quantity < 0.2·avg(l_quantity per part) — the cross-multiplied
    integer rule is a faithful rewrite, not an approximation.  (Exact on
    this testdata because quantities sit on the 1e-2 lattice and the
    float comparison never lands on a representability boundary.)"""
    t = nyc_views.load_tables(spark, sf_dir)
    li = t["lineitem"].join(
        F.broadcast(
            t["part"].where(F.col("p_brand") == "Brand#23").select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    float_n = (
        li.withColumn("__avg", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.2 * F.col("__avg"))
        .count()
    )
    assert qt.q_tpch_q17(spark, sf_dir).collect()[0].n_lines == float_n


def test_q18_threshold_and_limit(spark, sf_dir):
    rows = qt.q_tpch_q18(spark, sf_dir).collect()
    assert len(rows) <= 100
    assert all(r.total_qty > 250 for r in rows)
    # deterministic total order: totalprice desc, orderkey asc
    keys = [(-round(r.o_totalprice * 100), r.o_orderkey) for r in rows]
    assert keys == sorted(keys)


def test_q22_members_are_above_average_and_dormant(spark, sf_dir):
    t = nyc_views.load_tables(spark, sf_dir)
    nations = [2, 5, 9, 13, 17, 21, 24]
    cust = t["customer"].where(F.col("c_nationkey").isin(nations))
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal"))
        .collect()[0][0]
    )
    out = qt.q_tpch_q22(spark, sf_dir).collect()
    # per-nation averages of members must each exceed the global positive
    # average (every member does, so every group mean does)
    for r in out:
        assert r.numcust > 0
        assert r.totacctbal / r.numcust > avg_bal - 0.011
    total_members = sum(r.numcust for r in out)
    # recompute membership directly: above-average balance, no post-2000
    # order
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    direct = (
        cust.where(F.col("c_acctbal") > avg_bal)
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .count()
    )
    assert total_members == direct


def test_q10_limit_is_a_total_order(spark, sf_dir):
    rows = qt.q_tpch_q10(spark, sf_dir).collect()
    assert len(rows) <= 20
    keys = [(-round(r.revenue * 10000), r.c_custkey) for r in rows]
    assert keys == sorted(keys)


def test_q12_counts_partition_the_join(spark, sf_dir):
    out = qt.q_tpch_q12(spark, sf_dir).collect()
    t = nyc_views.load_tables(spark, sf_dir)
    joined = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in out) == joined


def test_q8_share_bounded(spark, sf_dir):
    for r in qt.q_tpch_q8(spark, sf_dir).collect():
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.total_revenue > 0


def test_q2_rows_achieve_their_parts_minimum(spark, sf_dir):
    rows = qt.q_tpch_q2(spark, sf_dir).collect()
    assert len(rows) > 0
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.s_acctbal)
    # all achieving suppliers of one part share the same (minimal) balance
    assert all(len(v) == 1 for v in by_part.values())


def test_q11_members_are_unique_and_positive_fractions(spark, sf_dir):
    rows = qt.q_tpch_q11(spark, sf_dir).collect()
    keys = [r.l_partkey for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r.value > 0 for r in rows)


def test_q16_bounds(spark, sf_dir):
    rows = qt.q_tpch_q16(spark, sf_dir).collect()
    keys = [(r.p_brand, r.p_type, r.p_size) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(1 <= r.supplier_cnt <= 100 for r in rows)


def test_q20_dominators_are_majority_shippers(spark, sf_dir):
    rows = qt.q_tpch_q20(spark, sf_dir).collect()
    names = [r.s_name for r in rows]
    assert len(names) == len(set(names))
    assert all(r.n_dominated >= 1 for r in rows)


def test_q21_total_order_and_limit(spark, sf_dir):
    rows = qt.q_tpch_q21(spark, sf_dir).collect()
    assert len(rows) <= 20
    keys = [(-r.numwait, r.s_name) for r in rows]
    assert keys == sorted(keys)


def test_q9_groups_are_distinct_nation_years(spark, sf_dir):
    rows = qt.q_tpch_q9(spark, sf_dir).collect()
    keys = [(r.nation, r.o_year) for r in rows]
    assert len(keys) == len(set(keys))
