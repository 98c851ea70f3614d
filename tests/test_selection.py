"""Gopher-rules filter + DSIR importance selection (operators/selection.py,
functions/text.py gopher helpers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.functions import text as T
from nyc_taxi_data_warehouse_spark.operators import selection


def _flags(spark, txt):
    df = spark.createDataFrame([(txt,)], ["text"]).select(
        "text", T.tokens("text").alias("w")
    )
    return df.select(
        T.word_count_from_tokens("w").alias("n_words"),
        T.mean_word_length_from_tokens("w").alias("mwl"),
        T.alpha_word_ratio_from_tokens("w").alias("alpha"),
        T.stopword_hits_from_tokens("w", "en").alias("stop_hits"),
        T.symbol_word_ratio("text", "w").alias("sym"),
    ).collect()[0]


def test_gopher_helpers_on_clean_text(spark):
    r = _flags(spark, "the quick brown fox jumps over a lazy dog of the town")
    assert r.n_words == 12
    assert 3.0 <= r.mwl <= 10.0
    assert r.alpha == 1.0
    assert r.stop_hits >= 2  # 'the' x2, 'a', 'of'
    assert r.sym == 0.0


def test_gopher_helpers_flag_bad_docs(spark):
    # symbol-heavy: two '#' and one '...' across 4 words
    r = _flags(spark, "buy ### now... cheap")
    assert r.sym > 0.1
    # non-Latin: alphabetic ratio 0
    r2 = _flags(spark, "中文 文本 文档")
    assert r2.alpha == 0.0 and r2.stop_hits == 0
    # empty text never divides by zero
    r3 = _flags(spark, "")
    assert r3.mwl == 0.0 and r3.alpha == 0.0 and r3.sym == 0.0


def test_dsir_weights_sign_and_scores(spark):
    # target docs speak vocabulary A, raw-only docs vocabulary B
    rows = []
    for i in range(20):
        rows.append((i, True, f"alpha{i % 5}"))
    for i in range(20, 40):
        rows.append((i, False, f"beta{i % 5}"))
    tok = spark.createDataFrame(rows, ["doc_id", "is_target", "t"]).select(
        "doc_id",
        "is_target",
        selection.hashed_token_bucket("t", 512).alias("bucket"),
    )
    w = selection.dsir_bucket_weights(tok, num_buckets=512)
    scored = selection.dsir_scores(tok, w).collect()
    by_doc = {r.doc_id: r.dsir_score for r in scored}
    # every target-vocab doc outscores every raw-only doc
    assert min(by_doc[i] for i in range(20)) > max(
        by_doc[i] for i in range(20, 40)
    )


def test_dsir_weight_table_is_bounded(spark):
    rows = [(i, i % 3 == 0, f"tok{i}") for i in range(5000)]
    tok = spark.createDataFrame(rows, ["doc_id", "is_target", "t"]).select(
        "doc_id",
        "is_target",
        selection.hashed_token_bucket("t", 256).alias("bucket"),
    )
    w = selection.dsir_bucket_weights(tok, num_buckets=256)
    assert w.count() <= 256
    # smoothing keeps every weight finite
    assert all(
        r.log_w is not None and abs(r.log_w) < 50 for r in w.collect()
    )
