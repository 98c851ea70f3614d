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


# --- portable (oracle-replayable) sketches: operators/sketches.py ----------

def _py_rho(value: str, p: int = 9) -> tuple[int, int]:
    """Reference bucket/rho straight from the md5 definition."""
    import hashlib

    h = int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)
    bits = 60 - p
    bucket = h & ((1 << p) - 1)
    w = h >> p
    if w == 0:
        return bucket, bits + 1
    return bucket, bits + 1 - w.bit_length()


def test_hll_registers_match_python_reference(spark):
    from nyc_taxi_data_warehouse_spark.operators import sketches

    vals = [f"tok{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        (r.bucket, r.rho)
        for r in sketches.hll_registers(df, "v", p=9).collect()
    }
    want: dict[int, int] = {}
    for v in vals:
        b, rho = _py_rho(v)
        want[b] = max(want.get(b, 0), rho)
    assert got == set(want.items())


def test_hll_estimate_within_error_bound(spark):
    from nyc_taxi_data_warehouse_spark.operators import sketches

    n = 5000
    df = spark.createDataFrame([(f"item-{i}",) for i in range(n)], ["v"])
    est = sketches.hll_estimate(df, "v", p=9).collect()[0].est_distinct
    # std err = 1.04/sqrt(512) ~= 4.6%; allow 3 sigma
    assert abs(est - n) / n < 0.14


def test_hll_registers_merge_by_max(spark):
    """Partition-and-merge: max of per-half register files == whole-corpus
    register file (the property that makes the shuffle sketch-sized)."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_warehouse_spark.operators import sketches

    vals = [(f"t{i}", i % 2) for i in range(400)]
    df = spark.createDataFrame(vals, ["v", "half"])
    whole = sketches.hll_registers(df, "v", p=6)
    halves = sketches.hll_registers(df, "v", group_cols=("half",), p=6)
    merged = halves.groupBy("bucket").agg(F.max("rho").alias("rho"))
    assert {(r.bucket, r.rho) for r in whole.collect()} == {
        (r.bucket, r.rho) for r in merged.collect()
    }


def test_cm_never_underestimates_and_exact_when_wide(spark):
    from nyc_taxi_data_warehouse_spark.operators import sketches

    counts = spark.createDataFrame(
        [(f"w{i}", (i % 7) + 1) for i in range(300)], ["token", "cnt"]
    )
    # narrow sketch: over-count possible, under-count never
    counters = sketches.cm_counters(counts, "token", "cnt", depth=3, width=64)
    est = sketches.cm_lookup(counters, counts, depth=3, width=64)
    rows = est.collect()
    assert len(rows) == 300
    assert all(r.cm_est >= r.cnt for r in rows)
    # wide sketch: 300 tokens into 4x65536 slots -> collisions vanish
    wide = sketches.cm_counters(counts, "token", "cnt", depth=4, width=65536)
    est_w = sketches.cm_lookup(wide, counts, depth=4, width=65536)
    assert all(r.cm_est == r.cnt for r in est_w.collect())


def test_cm_counter_table_is_bounded(spark):
    from nyc_taxi_data_warehouse_spark.operators import sketches

    counts = spark.createDataFrame(
        [(f"w{i}", 1) for i in range(5000)], ["token", "cnt"]
    )
    counters = sketches.cm_counters(counts, "token", "cnt", depth=4, width=128)
    assert counters.count() <= 4 * 128


def test_cm_lookup_unseen_probe_is_zero(spark):
    """A probe token never seen by the sketch has every counter empty;
    Count-Min defines that point-query as 0 (round-6 advice: left-join
    + coalesce, not inner-join)."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    counts = spark.createDataFrame([("seen", 7)], ["token", "cnt"])
    counters = sketches.cm_counters(counts, "token", "cnt", depth=3, width=64)
    probes = spark.createDataFrame([("seen",), ("never",)], ["token"])
    rows = {
        r.token: r.cm_est
        for r in sketches.cm_lookup(counters, probes, depth=3, width=64).collect()
    }
    assert rows["never"] == 0
    assert rows["seen"] >= 7


def test_cm_inner_product_disjoint_is_zero(spark):
    """Two sketches over disjoint key sets (wide enough that no slots
    collide) must estimate 0 — the empty-depth-row counts as 0 in the
    min, instead of being skipped (round-6 advice)."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    a = spark.createDataFrame([(f"a{i}", 1) for i in range(10)], ["k", "cnt"])
    b = spark.createDataFrame([(f"b{i}", 1) for i in range(10)], ["k", "cnt"])
    ca = sketches.cm_counters(a, "k", "cnt", depth=4, width=65536)
    cb = sketches.cm_counters(b, "k", "cnt", depth=4, width=65536)
    est = sketches.cm_inner_product(ca, cb).collect()[0].cm_join_est
    assert est == 0


def test_hll_small_m_alpha_constants():
    """Flajolet's per-m alpha constants apply below m=128 (round-6
    advice): 0.673 (m=16), 0.697 (m=32), 0.709 (m=64); the asymptotic
    formula takes over at m>=128."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    bits = 60  # _HASH_BITS
    for p, alpha in [(4, 0.673), (5, 0.697), (6, 0.709)]:
        m = 1 << p
        expected = alpha * m * m * float(1 << (bits - p + 1))
        assert sketches.hll_alpha_numerator(p) == expected
    m = 1 << 7
    expected = (0.7213 / (1.0 + 1.079 / m)) * m * m * float(1 << (bits - 6))
    assert sketches.hll_alpha_numerator(7) == expected


def test_cm_inner_product_bounds_join_size(spark):
    from nyc_taxi_data_warehouse_spark.operators import sketches

    a = spark.createDataFrame(
        [(f"k{i}", (i % 3) + 1) for i in range(100)], ["k", "cnt"]
    )
    b = spark.createDataFrame(
        [(f"k{i}", (i % 5) + 1) for i in range(0, 200, 2)], ["k", "cnt"]
    )
    exact = sum(((i % 3) + 1) * ((i % 5) + 1) for i in range(0, 100, 2))
    # narrow: over-estimates, never under
    ca = sketches.cm_counters(a, "k", "cnt", depth=3, width=32)
    cb = sketches.cm_counters(b, "k", "cnt", depth=3, width=32)
    est = sketches.cm_inner_product(ca, cb, depth=3).collect()[0].cm_join_est
    assert est >= exact
    # wide: collisions vanish -> exact inner product
    wa = sketches.cm_counters(a, "k", "cnt", depth=4, width=65536)
    wb = sketches.cm_counters(b, "k", "cnt", depth=4, width=65536)
    est_w = sketches.cm_inner_product(wa, wb).collect()[0].cm_join_est
    assert est_w == exact


def test_hll_overlap_inclusion_exclusion_invariants(spark, sf_dir):
    """q_hll_overlap: the union sketch dominates each single sketch
    (register-wise max is pointwise >=, and both estimator branches are
    monotone in the register file), and the inclusion-exclusion estimate
    tracks the exact intersection within a generous multiple of the p=9
    standard error (3 estimates x 4.6% each)."""
    from nyc_taxi_data_warehouse_spark.queries_data import q_hll_overlap

    rows = q_hll_overlap(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.est_union >= max(r.est_a, r.est_b) - 1e-6
        assert r.est_union <= r.est_a + r.est_b + 1e-6  # sub-additive
        bound = 0.2 * r.est_union + 50
        assert abs(r.est_intersection - r.exact_intersection) <= bound, (
            r.src_a, r.src_b, r.est_intersection, r.exact_intersection,
        )


def test_bloom_no_false_negatives_and_bounded(spark):
    """Every member key must probe may_contain=1 (Bloom filters have
    zero false negatives by construction), and the bit table is at most
    m rows regardless of input cardinality."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    members = spark.createDataFrame(
        [(i,) for i in range(500)], ["k"]
    )
    bits = sketches.bloom_bits(members, "k", m_bits=2048, k_hashes=4)
    assert bits.count() <= 2048
    probed = sketches.bloom_probe(bits, members, "k", m_bits=2048, k_hashes=4)
    assert probed.filter(F.col("may_contain") == 0).count() == 0


def test_bloom_definitely_absent_when_wide(spark):
    """With m huge relative to n, non-member probes come back 0 — the
    filter actually filters (and a false positive would need a 4-way
    hash collision in a 2^20 table over 20 keys: vanishingly unlikely,
    deterministic given md5)."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    members = spark.createDataFrame([(f"in{i}",) for i in range(20)], ["k"])
    others = spark.createDataFrame([(f"out{i}",) for i in range(20)], ["k"])
    bits = sketches.bloom_bits(members, "k", m_bits=1 << 20, k_hashes=4)
    probed = sketches.bloom_probe(bits, others, "k", m_bits=1 << 20, k_hashes=4)
    assert probed.filter(F.col("may_contain") == 1).count() == 0


def test_bloom_bits_or_merge_equals_union_build(spark):
    """Bloom bits OR together: union+distinct of two bit tables equals
    the bit table of the unioned key sets — the mergeability contract
    that lets per-partition filters roll up without a rebuild."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], ["k"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], ["k"])
    ba = sketches.bloom_bits(a, "k", m_bits=1024, k_hashes=3)
    bb = sketches.bloom_bits(b, "k", m_bits=1024, k_hashes=3)
    merged = ba.union(bb).distinct()
    direct = sketches.bloom_bits(a.union(b), "k", m_bits=1024, k_hashes=3)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_bloom_probe_k1_and_duplicate_bits_immune(spark):
    """k_hashes=1 is a legal bloom_bits config so the probe must accept
    it (F.least needs >= 2 args — the fold special-cases k==1), and a
    bits table with duplicate rows (union-merge without distinct) must
    not row-multiply the probe frame through the k left joins."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    members = spark.createDataFrame([(f"m{i}",) for i in range(30)], ["k"])
    bits = sketches.bloom_bits(members, "k", m_bits=512, k_hashes=1)
    probed = sketches.bloom_probe(bits, members, "k", m_bits=512, k_hashes=1)
    assert probed.count() == 30
    assert probed.filter(F.col("may_contain") == 0).count() == 0
    # duplicate every bit row; probe count and flags must be unchanged
    bits4 = sketches.bloom_bits(members, "k", m_bits=512, k_hashes=4)
    dup_bits = bits4.union(bits4)
    probed2 = sketches.bloom_probe(
        dup_bits, members, "k", m_bits=512, k_hashes=4
    )
    assert probed2.count() == 30
    assert probed2.filter(F.col("may_contain") == 0).count() == 0


def test_histogram_quantiles_bounds(spark, sf_dir):
    """The fixed-ruler histogram estimate sits at its bin's lower edge,
    so est <= exact < est + width; the shard registers merge losslessly
    (fixed edges => sum-merge is exact by construction)."""
    from nyc_taxi_data_warehouse_spark.queries_data import q_histogram_quantiles

    rows = q_histogram_quantiles(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.merge_lossless == 1
        assert r.within_bound == 1
        assert r.est_u <= r.exact_u < r.est_u + r.bin_width_u
        assert r.abs_err_u == r.exact_u - r.est_u


def test_kmv_bottom_k_bounded_and_mergeable(spark, sf_dir):
    """Sketch ≤ k rows per group; the merge of per-group sketches equals
    the sketch built directly over the whole input (the KMV union law)."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", F.col("l_orderkey").cast("string").alias("v")
    )
    k = 32
    per_group = sketches.kmv_bottom_k(li, "v", ("l_returnflag",), k)
    sizes = per_group.groupBy("l_returnflag").count().collect()
    assert all(r["count"] <= k for r in sizes)
    merged = sketches.kmv_merge([per_group.select("h")], (), k)
    direct = sketches.kmv_bottom_k(li, "v", (), k)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )


def test_kmv_estimate_exact_below_k_and_bounded_above(spark):
    from nyc_taxi_data_warehouse_spark.operators import sketches

    df = spark.range(2000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    k = 64
    bott = sketches.kmv_bottom_k(df, "v", ("g",), k)
    est = sketches.kmv_estimate_from_bottom(bott, ("g",), k).collect()[0]
    # 2000 distinct >> k: the estimator path, se ~= 1/sqrt(k-2) ~= 12.7%
    assert est.n_kept == k
    assert abs(est.est_distinct - 2000) / 2000 < 0.5
    small = spark.range(10).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    sb = sketches.kmv_bottom_k(small, "v", ("g",), k)
    se = sketches.kmv_estimate_from_bottom(sb, ("g",), k).collect()[0]
    assert se.n_kept == 10 and se.est_distinct == 10.0  # exact path


def test_mg_summary_never_overestimates_and_bound_holds(spark, sf_dir):
    """The mergeable-summaries theorem on real data: for every surviving
    key, 0 <= exact - est <= sum(shard deltas) + merge delta."""
    from nyc_taxi_data_warehouse_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(4)).alias(
            "shard"
        ),
        F.col("user_id").alias("key"),
    )
    counts = base.groupBy("shard", "key").agg(F.count("*").alias("cnt"))
    k = 8
    ssum = sketches.mg_compress(counts, "key", "cnt", ("shard",), k)
    d1 = sketches.mg_deltas(counts, "key", "cnt", ("shard",), k).agg(
        F.sum("delta")
    ).collect()[0][0]
    merged = sketches.mg_merge(ssum.select("key", "weight"), (), k)
    exact = {
        r.key: r.cnt
        for r in base.groupBy("key").agg(F.count("*").alias("cnt")).collect()
    }
    rows = merged.collect()
    assert 0 < len(rows) <= k
    for r in rows:
        under = exact[r.key] - r.weight
        assert 0 <= under <= d1 + r.delta


def test_mg_compress_is_exact_when_k_covers_keys(spark):
    from nyc_taxi_data_warehouse_spark.operators import sketches

    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2)], ["key", "cnt"]
    ).select("key", F.col("cnt").cast("long").alias("cnt"))
    out = sketches.mg_compress(df, "key", "cnt", (), k=8).collect()
    assert {(r.key, r.weight) for r in out} == {("a", 5), ("b", 3), ("c", 2)}
    assert all(r.delta == 0 for r in out)
