"""Document chunking and sequence packing — the two shape-transforms every
LLM training pipeline runs between curation and the data loader.

- `chunk_tokens`: sliding-window split of each document's token stream into
  fixed-size chunks with overlap. One narrow map stage (tokenize → start
  offsets → slice) plus the explode fan-out; no shuffle, so it scales with
  the scan no matter the corpus size.
- `pack_sequences`: "concat-and-cut" packing (the GPT-style pretraining
  layout): documents are laid end-to-end in a deterministic content-hash
  order and cut every `budget` tokens; a document's bin is where its first
  token lands. A single global ordering would serialize on one reducer, so
  packing is SHARDED: each document hashes to one of `n_shards` independent
  streams and the running-offset window runs per shard — parallelism =
  n_shards regardless of corpus size, and membership is reproducible
  because both the shard and the intra-shard order are pure functions of
  the key (same property as `sampling.hash_bucket`).

Beyond-reference capability (no analogous op in the reference warehouse;
see SURVEY.md "LLM-data-pipeline wave").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from .sampling import hash_bucket


def chunk_tokens(
    docs: DataFrame,
    chunk_size: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunks: starts at 0, stride `chunk_size −
    overlap`, while the chunk still contributes at least one NEW token
    (start + overlap < n_tokens) — a chunk that would only re-cover the
    previous chunk's tail is never emitted, so no token is duplicated
    beyond the declared overlap. The final chunk may be short; every
    non-final chunk is exactly `chunk_size` tokens. Empty documents yield
    no chunks. Returns (`id_col`, chunk_idx, chunk: array<string>)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = docs.select(F.col(id_col), T.tokens(text_col).alias("__w"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__w") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        toks.where(F.size("__w") > 0)
        .select(F.col(id_col), "__w", F.posexplode(starts).alias("chunk_idx", "__s"))
        .select(
            F.col(id_col),
            "chunk_idx",
            F.slice("__w", F.col("__s") + 1, chunk_size).alias("chunk"),
        )
    )


def pack_sequences(
    docs_with_len: DataFrame,
    budget: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    salt: str = "pack",
) -> DataFrame:
    """Assign every document a (shard, bin_idx): concat-and-cut packing of
    the shard's documents in md5-of-id order, cutting every `budget`
    tokens. Adds `shard`, `start_offset` (the document's first-token
    position within its shard stream) and `bin_idx`. One shuffle (the
    per-shard window sort); bins are reproducible across runs, engines and
    partitionings."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    d = docs_with_len.withColumn(
        "shard", hash_bucket(id_col, salt=salt, n_buckets=n_shards)
    ).withColumn("__h", h)
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    start = F.sum(len_col).over(w) - F.col(len_col)
    return (
        d.withColumn("start_offset", start)
        .withColumn("bin_idx", F.floor(F.col("start_offset") / budget))
        .drop("__h")
    )
