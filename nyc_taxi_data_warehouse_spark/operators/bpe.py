"""Byte-pair-encoding tokenizer training (Sennrich, Haddow, Birch:
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) — the distributed half of building a BPE vocabulary over a
training corpus.

The scale decomposition every production BPE trainer uses:

- **corpus → word-frequency table** is the 100 TB stage: one
  whitespace-tokenize + explode + map-side-combining groupBy over every
  document. The output is vocabulary-sized (≪ corpus), which is what
  makes the rest cheap.
- **merge learning** then iterates over the word-freq table only:
  count adjacent symbol pairs weighted by word frequency, take the
  top pair, merge it everywhere, repeat. Each round is one small
  aggregation job; the learned merge list (the tokenizer artifact)
  lives driver-side like any model being trained.

**Symbol representation** — every symbol is individually bracketed with
control characters: word "low" → ``␞l␟␞o␟␞w␟`` (␞ = 0x1e, ␟ = 0x1f).
Merging pair (a, b) is then one literal ``replace('␞a␟␞b␟' → '␞ab␟')``:

- both ends of BOTH symbols are anchored, so a pair can never match a
  PREFIX of a longer symbol (a separator-joined form like "b c" matches
  inside "b cd" — merging non-adjacent-symbol text; caught in review);
- adjacent matches share no characters, so left-to-right non-overlapping
  replacement — the semantics of ``replace`` in both engines — is
  exactly greedy BPE application, including over runs ("aaaa" with
  merge (a,a) → [aa, aa], not [aa, a, a]).

Words containing the bracket characters are excluded from training and
tokenization (hygiene filter, mirrored in the SQL oracle). Everything
is exact-integer counting with deterministic tie-breaks (count desc,
then lexicographic pair), so the learned merges are bit-reproducible
and SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

OPEN = "\x1e"  # record separator: starts every symbol
CLOSE = "\x1f"  # unit separator: ends every symbol


def _clean_words(words: DataFrame) -> DataFrame:
    """Drop words containing the bracket chars (cannot be represented)."""
    return words.where(
        ~F.col("word").contains(OPEN) & ~F.col("word").contains(CLOSE)
    )


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the corpus-scale stage: explode +
    map-side-combining count, output vocabulary-sized."""
    return _clean_words(
        docs.select(F.explode(T.tokens(text_col)).alias("word"))
    ).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def spaced_symbols(name: str = "word") -> Column:
    """The column `name` (a word) as bracketed character symbols
    (``␞c␟`` per char, concatenated).

    substr-based char split (not split-by-empty-regex) so the SQL oracle
    twin has identical edge semantics; both engines' substring is
    codepoint-based."""
    return F.expr(
        f"array_join(transform(sequence(1, length({name})), "
        f"i -> concat('{OPEN}', substring({name}, i, 1), '{CLOSE}')), '')"
    )


def _symbols_of(name: str = "sym") -> Column:
    """Split the bracketed symbol string in column `name` back into its
    symbol array: strip the leading ␞ and trailing ␟, split on ␟␞."""
    inner = F.expr(f"substring({name}, 2, length({name}) - 2)")
    return F.split(inner, CLOSE + OPEN)


def pair_counts(sym_freq: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word frequency over a
    (sym, freq) frame. Pair extraction is a zip of the symbol array with
    itself shifted by one (slice keeps it total for 1-symbol words: a
    zero-length slice yields no pairs)."""
    s = _symbols_of("sym")
    pairs = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1), F.slice(s, 2, F.size(s) - 1)
    )
    return (
        sym_freq.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.0").alias("lhs"), F.col("p.1").alias("rhs"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _merge_expr(sym: Column, lhs: str, rhs: str) -> Column:
    return F.replace(
        sym,
        F.lit(OPEN + lhs + CLOSE + OPEN + rhs + CLOSE),
        F.lit(OPEN + lhs + rhs + CLOSE),
    )


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """Learn `n_merges` BPE merges over the corpus; returns the merge
    table (merge_rank, lhs, rhs, pair_count) — the tokenizer artifact.

    One corpus-scale word count, then per merge round one vocab-sized
    pair aggregation + a 1-row top-pair collect (ties: count desc, lhs
    asc, rhs asc) and a literal replace on the symbol strings. The
    word-freq frame is persisted; each round's lineage grows by a single
    replace expression over it."""
    spark = docs.sparkSession
    wf = word_freqs(docs, text_col).persist()
    sym = wf.select(spaced_symbols("word").alias("sym"), "freq")
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        top = (
            pair_counts(sym)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["pair_count"])
        merges.append((r, lhs, rhs, cnt))
        sym = sym.withColumn("sym", _merge_expr(F.col("sym"), lhs, rhs))
    wf.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank bigint, lhs string, rhs string, pair_count bigint",
    )


def apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list: per word, start from
    bracketed character symbols and apply each merge in learned order
    (greedy left-to-right via the same literal replace). Returns (id,
    tokens array<string>) — one narrow map stage, merges inlined as
    literals. Words containing the bracket chars are dropped, matching
    training."""
    toks = _clean_words(
        docs.select(
            F.col(id_col), F.posexplode(T.tokens(text_col)).alias("pos", "word")
        )
    )
    sym = spaced_symbols("word")
    for lhs, rhs in merges:
        sym = _merge_expr(sym, lhs, rhs)
    stripped = F.expr("substring(__sym, 2, length(__sym) - 2)")
    per_word = toks.withColumn("__sym", sym).select(
        F.col(id_col),
        F.struct(
            "pos", F.split(stripped, CLOSE + OPEN).alias("t")
        ).alias("w"),
    )
    # array_sort on (pos, t) structs restores document word order —
    # collect_list alone is partition-order dependent
    return per_word.groupBy(id_col).agg(
        F.flatten(
            F.transform(F.array_sort(F.collect_list("w")), lambda x: x["t"])
        ).alias("tokens")
    )
