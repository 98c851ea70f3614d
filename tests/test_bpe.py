"""BPE trainer tests: textbook merge sequence, greedy run semantics,
merge application order, and edge cases (1-char words, empty text)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators import bpe


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new lower")],
        ["doc_id", "text"],
    )


def test_textbook_merge_sequence(spark, docs):
    got = [tuple(r) for r in bpe.bpe_train(docs, 5).collect()]
    assert got == [
        (1, "l", "o", 6),
        (2, "lo", "w", 6),
        (3, "e", "w", 4),
        (4, "n", "ew", 4),
        (5, "e", "r", 3),
    ]


def test_train_is_deterministic(spark, docs):
    a = [tuple(r) for r in bpe.bpe_train(docs, 4).collect()]
    b = [tuple(r) for r in bpe.bpe_train(docs, 4).collect()]
    assert a == b


def test_greedy_run_merge_semantics(spark):
    """Merging (a, a) over 'aaaa' must produce [aa, aa] and over 'aaa'
    [aa, a] — the double-space delimiter guarantees adjacent matches
    don't share delimiter characters (single-space would under-merge)."""
    d = spark.createDataFrame([(1, "aaaa aaa")], ["doc_id", "text"])
    mt = bpe.bpe_train(d, 1)
    assert [tuple(r) for r in mt.collect()] == [(1, "a", "a", 5)]
    toks = bpe.apply_merges(d, [("a", "a")]).collect()[0]["tokens"]
    assert toks == ["aa", "aa", "aa", "a"]


def test_apply_merges_preserves_word_order(spark):
    d = spark.createDataFrame(
        [(1, "ab cd ab"), (2, "cd ab")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["tokens"]
        for r in bpe.apply_merges(d, [("a", "b")]).collect()
    }
    assert out[1] == ["ab", "c", "d", "ab"]
    assert out[2] == ["c", "d", "ab"]


def test_single_char_words_produce_no_pairs(spark):
    d = spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"])
    assert bpe.bpe_train(d, 3).count() == 0
    out = bpe.apply_merges(d, []).collect()[0]["tokens"]
    assert out == ["a", "b", "c", "a", "b"]


def test_merge_count_stops_when_pairs_exhausted(spark):
    d = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    mt = bpe.bpe_train(d, 10).collect()
    # after merging (a,b) the only word is a single symbol: training stops
    assert [tuple(r)[:3] for r in mt] == [(1, "a", "b")]


def test_word_freqs_counts(spark, docs):
    wf = {r["word"]: r["freq"] for r in bpe.word_freqs(docs).collect()}
    assert wf["low"] == 3 and wf["lower"] == 2 and wf["new"] == 2


def test_merge_never_crosses_symbol_boundary(spark):
    """Review regression: with separator-joined symbols, pair (b, c)
    matched the PREFIX of the merged symbol 'cd' inside 'bcd'. The
    bracketed representation must tokenize 'bcd' as [b, cd], and the
    learned vocabulary must cover every emitted token."""
    d = spark.createDataFrame(
        [(1, "cd cd cd cd bc bc bc bcd")], ["doc_id", "text"]
    )
    mt = [tuple(r) for r in bpe.bpe_train(d, 2).collect()]
    assert [(m[1], m[2]) for m in mt] == [("c", "d"), ("b", "c")]
    toks = {
        r["doc_id"]: r["tokens"]
        for r in bpe.apply_merges(d, [(m[1], m[2]) for m in mt]).collect()
    }
    # 'bcd' = [b][c][d] -> merge (c,d) -> [b][cd]; merge (b,c) must NOT
    # fire (c is inside symbol 'cd')
    assert toks[1] == ["cd"] * 4 + ["bc"] * 3 + ["b", "cd"]
    vocab = {"c", "d", "b", "cd", "bc"}
    assert set(toks[1]) <= vocab


def test_bracket_words_are_dropped(spark):
    d = spark.createDataFrame(
        [(1, "ok ok\x1ebad also\x1fbad ok")], ["doc_id", "text"]
    )
    wf = {r["word"]: r["freq"] for r in bpe.word_freqs(d).collect()}
    assert wf == {"ok": 2}
