"""Custom stateful streaming operator: Misra-Gries heavy hitters via
`applyInPandasWithState` — the deterministic-guarantee top-k beside the
randomized stream sketches (HLL/Count-Min/Bloom/KMV).

State per shard is ≤ k (key, weight) counters — FIXED size regardless of
feed volume, the property every stream sketch here shares.  Each
micro-batch folds its counts into the counters and re-compresses to k by
subtracting the (k+1)-th largest weight and dropping non-positives (the
batched MG step; every subtraction of δ removes ≥ (k+1)·δ mass, so the
per-shard total subtraction is ≤ n_shard/(k+1)).

The load-bearing invariant (what the oracle gates): with shards keyed by
a HASH OF THE KEY, a key's full stream lands in one shard, so any key
with global frequency > n/(k+1) ≥ n_shard/(k+1) keeps a positive counter
through every compression and MUST be present in the final summary — for
ANY micro-batch slicing.  Estimated weights are slicing-dependent (MG is
order-sensitive) and are therefore asserted only as bounds in pytest,
never hash-compared across engines.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MG_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("key", LongType()),
        StructField("weight", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("seq", IntegerType()),
        StructField("keys", ArrayType(LongType())),
        StructField("weights", ArrayType(LongType())),
    ]
)


def mg_topk_stream(
    keyed: DataFrame,
    k: int = 16,
    shard_col: str = "shard",
    key_col: str = "key",
) -> DataFrame:
    """Per-shard streaming MG(k) over a (shard, key) stream.  Emits the
    full post-batch summary each micro-batch tagged with a monotone
    ``seq`` — the consumer keeps each shard's max-seq rows (memory sinks
    append updates; the tag makes the FINAL state recoverable).  A batch
    whose compression drops every counter emits one NULL-key sentinel
    row, so the max-seq rows are ALWAYS the true (possibly empty) final
    state — never a stale earlier summary."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        cnts = rows.groupby(key_col).size()
        if state.exists:
            seq, keys, weights = state.get
            d = {int(a): int(b) for a, b in zip(keys, weights)}
        else:
            seq, d = 0, {}
        for kk, c in cnts.items():
            d[int(kk)] = d.get(int(kk), 0) + int(c)
        if len(d) > k:
            delta = sorted(d.values(), reverse=True)[k]  # (k+1)-th largest
            d = {kk: w - delta for kk, w in d.items() if w - delta > 0}
        seq += 1
        state.update((seq, list(d.keys()), [int(v) for v in d.values()]))
        # Always emit ≥1 row per (shard, batch): if compression dropped
        # every counter (all weights equal the (k+1)-th largest), a
        # 0-row summary would leave the max-seq consumer reading the
        # PREVIOUS batch's stale rows as "final state".  The NULL-key
        # sentinel advances seq without asserting any counter; consumers
        # join/filter on key, so the sentinel never surfaces as a result.
        keys_out = list(d.keys()) or [None]
        wts_out = [int(v) for v in d.values()] or [None]
        yield pd.DataFrame(
            {
                "shard": int(key[0]),
                "seq": seq,
                "key": pd.array(keys_out, dtype="Int64"),
                "weight": pd.array(wts_out, dtype="Int64"),
            }
        )

    return keyed.groupBy(shard_col).applyInPandasWithState(
        fn,
        outputStructType=MG_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
