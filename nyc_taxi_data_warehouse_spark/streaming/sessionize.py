"""Custom stateful streaming operator: inactivity-gap sessionization via
`applyInPandasWithState` (Arrow-batched per-group state).

The reference has no true streaming (SURVEY §2.9) — this is the engine's
scale-path generalization of its hourly event feeds: a per-key session
rollup no built-in window can express (sessions have data-dependent
boundaries). State is one open session per key; closed sessions emit as
soon as a gap is observed; the open tail survives across micro-batches.

Scale design: state is O(1) per key (4 scalars), grouped state is
hash-partitioned by key across executors, and each micro-batch moves only
that batch's rows — the standard formulation for billions of keys. Use
`GroupStateTimeout.EventTimeTimeout` + a watermark in production to flush
idle sessions; tests drain with `availableNow` where the tail legitimately
stays open.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("open_start", TimestampType()),
        StructField("open_last", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key sessionization of a streaming DataFrame: rows closer than
    `gap_minutes` chain into one session; a longer gap closes the current
    session (emitted) and opens a new one (kept in state)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        if state.exists:
            start, last, n, tv = state.get
            cur = [pd.Timestamp(start), pd.Timestamp(last), int(n), float(tv)]
        else:
            cur = None
        closed = []
        for r in rows.itertuples(index=False):
            ts = getattr(r, ts_col)
            val = float(getattr(r, value_col))
            if cur is None:
                cur = [ts, ts, 1, val]
            elif ts - cur[1] > gap:
                closed.append((key[0], cur[0], cur[1], cur[2], cur[3]))
                cur = [ts, ts, 1, val]
            else:
                cur[1], cur[2], cur[3] = ts, cur[2] + 1, cur[3] + val
        state.update((cur[0].to_pydatetime(), cur[1].to_pydatetime(), cur[2], cur[3]))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
