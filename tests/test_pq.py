"""Product-quantization operator tests: determinism, code validity, ADC
score exactness against a numpy reconstruction, and retrieval sanity on
well-separated clusters."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators import pq


def _clustered(spark, n_per=10, dim=8):
    """4 well-separated axis-aligned clusters; cluster c owns ids
    [c*n_per, (c+1)*n_per). Values in [-1, 1] like real embeddings."""
    rows = []
    for c in range(4):
        for i in range(n_per):
            base = [0.0] * dim
            base[c * 2] = 0.9
            base[c * 2 + 1] = -0.7
            # deterministic small jitter so members differ
            jit = [((i * 7 + d * 3) % 5 - 2) / 100.0 for d in range(dim)]
            rows.append((c * n_per + i, [b + j for b, j in zip(base, jit)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


@pytest.fixture(scope="module")
def corpus(spark):
    return _clustered(spark).persist()


def test_fit_is_deterministic(spark, corpus):
    cb1 = pq.pq_fit(corpus, m=2, k=4, n_iter=2)
    cb2 = pq.pq_fit(corpus, m=2, k=4, n_iter=2)
    assert cb1 == cb2
    assert len(cb1) == 2 and all(len(s) == 4 for s in cb1)
    assert all(len(cv) == 4 for s in cb1 for cv in s)  # dim/m coords
    assert all(isinstance(x, int) for s in cb1 for cv in s for x in cv)


def test_dim_not_divisible_raises(spark, corpus):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_fit(corpus, m=3, k=2, n_iter=1)


def test_encode_codes_in_range(spark, corpus):
    cb = pq.pq_fit(corpus, m=2, k=4, n_iter=2)
    enc = pq.pq_encode(corpus, cb).collect()
    assert len(enc) == 40
    for r in enc:
        assert len(r["codes"]) == 2
        assert all(0 <= c < 4 for c in r["codes"])


def test_adc_score_matches_numpy_reconstruction(spark, corpus):
    """The returned adc_score must equal the exact integer dot product of
    the quantized query slices with the coded centroids — recomputed
    independently driver-side."""
    import math

    cb = pq.pq_fit(corpus, m=2, k=4, n_iter=2)
    codes = {r["vec_id"]: r["codes"] for r in pq.pq_encode(corpus, cb).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    got = pq.pq_search(
        corpus.where(F.col("vec_id").isin([0, 25])), pq.pq_encode(corpus, cb), cb, k=3
    ).collect()
    assert got
    for r in got:
        q = [math.floor(x * 1000) for x in vecs[r["query_id"]]]
        expect = 0
        for s in range(2):
            cent = cb[s][codes[r["neighbor_id"]][s]]
            qs = q[s * 4 : (s + 1) * 4]
            expect += sum(a * b for a, b in zip(qs, cent))
        assert r["adc_score"] == expect


def test_search_retrieves_own_cluster(spark, corpus):
    """With 4 separated clusters and k=4 codes per subspace, every
    query's top-3 neighbors come from the query's own cluster."""
    cb = pq.pq_fit(corpus, m=2, k=4, n_iter=3)
    enc = pq.pq_encode(corpus, cb)
    out = pq.pq_search(
        corpus.where(F.col("vec_id") % 10 == 0), enc, cb, k=3
    ).collect()
    assert len(out) == 4 * 3
    for r in out:
        assert r["neighbor_id"] // 10 == r["query_id"] // 10


def test_ivfpq_residuals_are_exact(spark, corpus):
    """residual + centroid == quantized vector, per coordinate."""
    import math

    coarse = pq.pq_fit(corpus, m=1, k=4, n_iter=2)
    res = {r["vec_id"]: (r["cell"], r["res"])
           for r in pq.ivfpq_residuals(corpus, coarse).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    for vid, (cell, rv) in res.items():
        q = [math.floor(x * 1000) for x in vecs[vid]]
        cent = coarse[0][cell]
        assert [a + b for a, b in zip(rv, cent)] == q


def test_ivfpq_search_stays_in_cell_and_is_deterministic(spark, corpus):
    out1 = pq.ivfpq_search(
        corpus.where(F.col("vec_id") % 10 == 0), corpus,
        k_cells=4, m=2, k_codes=4, k=3,
    ).collect()
    out2 = pq.ivfpq_search(
        corpus.where(F.col("vec_id") % 10 == 0), corpus,
        k_cells=4, m=2, k_codes=4, k=3,
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    coarse = pq.pq_fit(corpus, m=1, k=4, n_iter=2)
    cells = {r["vec_id"]: r["cell"]
             for r in pq.ivfpq_residuals(corpus, coarse).collect()}
    for r in out1:
        assert cells[r["neighbor_id"]] == cells[r["query_id"]]


def test_ivfpq_multiprobe_single_probe_identical(spark, corpus):
    """n_probe=1 must preserve the original single-probe results exactly
    (the gated query hash depends on it)."""
    args = dict(k_cells=4, m=2, k_codes=4, k=3)
    qs = corpus.where(F.col("vec_id") % 10 == 0)
    base = sorted(map(tuple, pq.ivfpq_search(qs, corpus, **args).collect()))
    one = sorted(
        map(tuple, pq.ivfpq_search(qs, corpus, n_probe=1, **args).collect())
    )
    assert one == base


def test_ivfpq_multiprobe_expands_candidates_and_recall(spark, corpus):
    """Probing more cells can only widen the candidate set: every scored
    neighbor lives in one of the query's n_probe nearest cells, results
    at n_probe=k_cells cover ALL cells (candidate set = whole corpus),
    and recall@k vs exact cosine is monotone in n_probe."""
    from nyc_taxi_data_warehouse_spark.operators import similarity

    args = dict(k_cells=4, m=2, k_codes=4, k=3)
    qs = corpus.where(F.col("vec_id") % 10 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_knn(qs, corpus, k=3).collect()
    }

    def recall(n_probe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in pq.ivfpq_search(qs, corpus, n_probe=n_probe, **args).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2, rall = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= rall
    # probe-all scores the entire corpus: in this well-separated fixture
    # the ADC ranking recovers most of the exact top-3
    assert rall >= 0.8


def test_ivfpq_rejects_multi_subspace_coarse(spark, corpus):
    fine = pq.pq_fit(corpus, m=2, k=2, n_iter=1)
    with pytest.raises(ValueError, match="m=1"):
        pq.ivfpq_residuals(corpus, fine)


def test_codebook_df_roundtrip(spark, corpus):
    cb = pq.pq_fit(corpus, m=2, k=4, n_iter=1)
    df = pq.pq_codebook_df(spark, cb).collect()
    assert len(df) == 8
    back: dict = {}
    for r in df:
        back.setdefault(r["subspace"], {})[r["code_id"]] = list(r["cv"])
    assert [
        [back[s][c] for c in range(4)] for s in range(2)
    ] == cb


def test_adc_lut_equals_direct_fold_on_random_codebooks(spark):
    """The LUT rewrite invariant: Σ_s lut[s][codes[s]] must equal the
    direct per-pair fold Σ_s dist(q_s, cb[s][code_s]) for BOTH metrics,
    over pseudo-random integer codebooks/queries/codes (deterministic
    LCG — no global randomness). Pins that the distance-table
    optimization can never drift from the scoring definition."""
    def lcg(seed):
        x = seed
        while True:
            x = (x * 1103515245 + 12345) % (1 << 31)
            yield x

    g = lcg(42)
    m, k, sub = 3, 5, 4
    for trial in range(5):
        cb = [
            [[next(g) % 2001 - 1000 for _ in range(sub)] for _ in range(k)]
            for _ in range(m)
        ]
        q = [next(g) % 2001 - 1000 for _ in range(m * sub)]
        codes = [next(g) % k for _ in range(m)]
        dot = sum(
            sum(a * b for a, b in zip(q[s * sub:(s + 1) * sub], cb[s][codes[s]]))
            for s in range(m)
        )
        l2 = sum(
            sum((a - b) ** 2 for a, b in zip(q[s * sub:(s + 1) * sub], cb[s][codes[s]]))
            for s in range(m)
        )
        row = spark.createDataFrame([(q, codes)], ["__qv", "codes"]).select(
            pq._slices(F.transform("__qv", lambda x: x.cast("long")), m, sub).alias("__qs"),
            # production codes are array<int> (the transform-index type);
            # createDataFrame defaults Python ints to bigint
            F.col("codes").cast("array<int>").alias("codes"),
        ).select(
            pq._adc_lut(cb, "__qs", "dot").alias("__lut_dot"),
            pq._adc_lut(cb, "__qs", "l2").alias("__lut_l2"),
            "codes",
        ).select(
            pq._lut_score(m, "__lut_dot").alias("sd"),
            pq._lut_score(m, "__lut_l2").alias("sl"),
        ).collect()[0]
        assert row["sd"] == dot, f"trial {trial}: dot LUT {row['sd']} != {dot}"
        assert row["sl"] == l2, f"trial {trial}: l2 LUT {row['sl']} != {l2}"


# --- persisted index artifact ----------------------------------------------

def test_ivfpq_save_load_roundtrip_identical_serving(spark, corpus, tmp_path):
    """A loaded index must serve bit-identical results to the in-memory
    index it was saved from (frozen codebooks + code table round-trip)."""
    args = dict(k_cells=4, m=2, k_codes=4, coarse_iter=1, fine_iter=1)
    idx = pq.ivfpq_build(corpus, **args)
    path = str(tmp_path / "ann_index")
    ver = pq.ivfpq_save(spark, idx, path)
    assert ver == 1
    loaded = pq.ivfpq_load(spark, path)
    assert loaded.coarse == idx.coarse
    assert loaded.fine == idx.fine
    assert loaded.quant == idx.quant
    qs = corpus.where(F.col("vec_id") % 10 == 0)
    mem = sorted(map(tuple, pq.ivfpq_search(qs, corpus, index=idx, **args).collect()))
    disk = sorted(map(tuple, pq.ivfpq_search(qs, corpus, index=loaded, **args).collect()))
    assert mem == disk


def test_ivfpq_append_encodes_against_frozen_codebooks(spark, tmp_path):
    """Appending gen-2 vectors must (a) not change the codebooks,
    (b) add exactly the new ids, (c) keep old codes byte-identical, and
    (d) equal a from-scratch encode of the full corpus against the SAME
    gen-1 codebooks (frozen-codebook contract)."""
    full = _clustered(spark)
    gen1 = full.where(F.col("vec_id") % 10 != 0)
    gen2 = full.where(F.col("vec_id") % 10 == 0)
    args = dict(k_cells=4, m=2, k_codes=4, coarse_iter=1, fine_iter=1)
    idx1 = pq.ivfpq_build(gen1, **args)
    path = str(tmp_path / "ann_index")
    pq.ivfpq_save(spark, idx1, path)
    v2 = pq.ivfpq_append(spark, path, gen2)
    assert v2 == 2
    loaded = pq.ivfpq_load(spark, path)
    assert loaded.coarse == idx1.coarse and loaded.fine == idx1.fine
    got = {r.vec_id: (r.cell, tuple(r.codes)) for r in loaded.codes.collect()}
    assert set(got) == {r.vec_id for r in full.collect()}
    old = {r.vec_id: (r.cell, tuple(r.codes)) for r in idx1.codes.collect()}
    assert all(got[k] == v for k, v in old.items())
    # from-scratch encode of the full corpus vs the same frozen codebooks
    res = pq.ivfpq_residuals(full, idx1.coarse, idx1.quant)
    ref = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in pq.pq_encode(
            res, idx1.fine, quant=None, vec_col="res", keep=("cell",)
        ).collect()
    }
    assert got == ref
    # prior version still loads (time travel)
    v1 = pq.ivfpq_load(spark, path, version=1)
    assert {r.vec_id for r in v1.codes.collect()} == set(old)


def test_ivfpq_append_is_insert_only(spark, tmp_path):
    """Re-appending vectors whose ids already exist must not duplicate or
    overwrite them (idempotent re-ingest)."""
    full = _clustered(spark)
    args = dict(k_cells=4, m=2, k_codes=4, coarse_iter=1, fine_iter=1)
    idx = pq.ivfpq_build(full, **args)
    path = str(tmp_path / "ann_index")
    pq.ivfpq_save(spark, idx, path)
    pq.ivfpq_append(spark, path, full.where(F.col("vec_id") < 5))
    loaded = pq.ivfpq_load(spark, path)
    assert loaded.codes.count() == full.count()
