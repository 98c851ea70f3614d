"""Round-11 operator tests: incremental ingest dedup vs a persisted
signature store (dedup.signature_records / dedup.incremental_neardup)."""

from __future__ import annotations

import pytest

from nyc_taxi_data_warehouse_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    # long texts so 3-gram shingles exist; doc 5 is a short (shingle-less)
    # doc; doc 4 duplicates doc 1 exactly; doc 6 is a near-dup of doc 2
    words = lambda seed, n: " ".join(f"w{seed}_{i}" for i in range(n))
    rows = [
        (1, words(1, 40)),
        (2, words(2, 40)),
        (3, words(3, 40)),
    ]
    batch = [
        (4, words(1, 40)),              # exact copy of doc 1
        (5, "tiny"),                    # shingle-less: exact-only leg
        (6, words(2, 40) + " extra"),   # near-dup of doc 2 (shares grams)
        (7, words(7, 40)),              # genuinely new
    ]
    hist_df = spark.createDataFrame(rows, "doc_id long, text string")
    batch_df = spark.createDataFrame(batch, "doc_id long, text string")
    return hist_df, batch_df


def test_incremental_neardup_decisions(spark, corpus):
    hist, batch = corpus
    store = dedup.signature_records(hist)
    report, merged = dedup.incremental_neardup(batch, store)
    d = {r.doc_id: r for r in report.collect()}
    assert set(d) == {4, 5, 6, 7}
    assert d[4].decision == "exact_dup" and d[4].is_exact_dup == 1
    assert d[5].decision == "new"  # short doc: no shingles, exact leg only
    assert d[6].decision == "near_dup" and d[6].n_near_store >= 1
    assert d[7].decision == "new" and d[7].n_near_store == 0
    # merged store = history + accepted (new) docs only
    ids = {r.doc_id for r in merged.select("doc_id").collect()}
    assert ids == {1, 2, 3, 5, 7}


def test_incremental_neardup_idempotent(spark, corpus):
    """Re-ingesting the same batch against the merged store is a no-op:
    every previously-accepted doc reports exact_dup, previously-rejected
    docs keep their rejection, and the store does not grow."""
    hist, batch = corpus
    store = dedup.signature_records(hist)
    _, merged = dedup.incremental_neardup(batch, store)
    report2, merged2 = dedup.incremental_neardup(batch, merged)
    d = {r.doc_id: r.decision for r in report2.collect()}
    # 4 matches doc 1's content; 5 and 7 now match their own stored hash
    assert d[4] == "exact_dup"
    assert d[5] == "exact_dup"
    assert d[7] == "exact_dup"
    assert d[6] in ("exact_dup", "near_dup")  # rejected again, never 'new'
    assert merged2.count() == merged.count()


def test_incremental_neardup_no_null_band_bucket(spark):
    """Two shingle-less docs (NULL signatures) must NOT pair via a NULL
    band bucket — the groupBy-treats-NULLs-as-equal trap."""
    hist = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    batch = spark.createDataFrame([(2, "cd")], "doc_id long, text string")
    store = dedup.signature_records(hist)
    report, _ = dedup.incremental_neardup(batch, store)
    row = report.collect()[0]
    assert row.decision == "new" and row.n_near_store == 0


def test_signature_records_schema(spark, corpus):
    hist, _ = corpus
    rec = dedup.signature_records(hist, num_hashes=8)
    cols = rec.columns
    assert cols[:2] == ["doc_id", "content_hash"]
    assert [c for c in cols if c.startswith("h")] == [f"h{i}" for i in range(8)]
