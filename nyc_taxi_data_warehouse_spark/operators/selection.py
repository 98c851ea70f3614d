"""DSIR-style data selection: importance weights from hashed n-gram features.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", public) select pretraining documents whose hashed-feature
distribution looks like a target corpus: fit two smoothed unigram models
over hashed token buckets (target vs raw), score each document by its
log-likelihood ratio, and keep the top-weighted documents.

Spark-first shape — the whole pipeline is three fixed-size structures:

1. ONE corpus scan folds (bucket → target-count, raw-count) with map-side
   partial aggregation: ≤ ``num_buckets`` rows shuffle, never the corpus.
2. The bucket→log-weight table (≤ num_buckets rows) is broadcast; scoring
   is a map-side hash join + per-doc sum — the corpus shuffles once, on
   doc_id, already reduced to (doc_id, partial-sum).
3. Top-k selection goes through the salted two-phase prune
   (`sampling.top_k_prune`) so no vocabulary- or corpus-sized
   single-task window exists.

Determinism: buckets are md5-derived (engine-portable, type-stable); the
per-doc float sum follows the BM25 precedent — epsilon-shifted rounding
before any cross-engine comparison or ranking, so DuckDB ranks the SAME
rounded values (see NOTES "Oracle float parity").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_token_bucket(tok: Column | str, num_buckets: int = 4096) -> Column:
    """md5-derived feature bucket in [0, num_buckets) — the hashed n-gram
    feature map of DSIR (any engine replays it; xxhash64 would not be
    portable and is type-sensitive, see the bloom lesson)."""
    c = tok if isinstance(tok, Column) else F.col(tok)
    return F.pmod(
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long"),
        F.lit(num_buckets),
    ).cast("int")


def dsir_bucket_weights(
    tok: DataFrame,
    bucket_col: str = "bucket",
    is_target_col: str = "is_target",
    num_buckets: int = 4096,
) -> DataFrame:
    """(bucket, log_w): log-likelihood ratio of the two add-one-smoothed
    unigram bucket models.  ONE pass over the token stream — the target
    counts are a conditional sum inside the same groupBy that counts raw
    occurrences, and the totals enter via a broadcast 1-row aggregate of
    the ≤ num_buckets counts frame (no second corpus scan).

    Buckets absent from the raw corpus are omitted: a scored document can
    only contain tokens that exist in the raw corpus, so the scoring join
    never misses (callers scoring a FOREIGN corpus should left-join and
    fill with ln((Nr+B)/(Nt+B)) — the all-smoothing weight).
    """
    cnts = tok.groupBy(bucket_col).agg(
        F.sum(F.when(F.col(is_target_col), 1).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.count(F.lit(1)).cast("long").alias("cr"),
    )
    tot = cnts.agg(
        F.sum("ct").cast("long").alias("nt"), F.sum("cr").cast("long").alias("nr")
    )
    b = float(num_buckets)
    log_w = F.log(
        (F.col("ct").cast("double") + 1.0) / (F.col("nt").cast("double") + b)
    ) - F.log(
        (F.col("cr").cast("double") + 1.0) / (F.col("nr").cast("double") + b)
    )
    return cnts.crossJoin(F.broadcast(tot)).select(
        bucket_col, log_w.alias("log_w")
    )


def dsir_scores(
    tok: DataFrame,
    weights: DataFrame,
    doc_col: str = "doc_id",
    bucket_col: str = "bucket",
) -> DataFrame:
    """(doc, dsir_score): per-document sum of broadcast bucket weights.

    The raw float sum is order-sensitive in the last ulps — callers MUST
    round (``_rnd``-style) before ranking or comparing across engines.
    """
    return (
        tok.join(F.broadcast(weights), bucket_col)
        .groupBy(doc_col)
        .agg(F.sum("log_w").alias("dsir_score"))
    )
