"""Approximate-structure coverage: the sketches 100 TB profiling leans on.

These are inherently approximate, so they are bound-tested against exact
answers (no DuckDB hash-oracle — the gate would be meaningless for
randomized summaries):

- `approx_count_distinct` (HyperLogLog++): relative error within the
  configured rsd on a known-cardinality column.
- `hll_sketch_agg` / `hll_union` / `hll_sketch_estimate` (DataSketches
  HLL): mergeable sketches — the partition-and-merge shape distributed
  distinct-counting uses; union of per-group sketches ≈ global distinct.
- `count_min_sketch`: the aggregate produces a serialized sketch whose
  size is bounded by (eps, confidence), not by data volume.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_approx_count_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_orderkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact < 0.06  # 3x rsd safety margin


def test_hll_sketches_merge_across_groups(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_orderkey").distinct().count()
    # one sketch per return-flag group (the per-partition shape), then union
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    assert abs(merged - exact) / exact < 0.05


def test_count_min_sketch_is_bounded_size(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.count_min_sketch(
            "l_returnflag", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("sk")
    ).collect()[0]
    # serialized sketch exists and its size is set by (eps, confidence),
    # not by row count — the whole point of sketching at scale
    assert row.sk is not None and 0 < len(row.sk) < 200_000
