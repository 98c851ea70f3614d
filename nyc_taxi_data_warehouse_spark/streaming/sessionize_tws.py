"""Inactivity-gap sessionization on the Spark 4 `transformWithState`
API (`StatefulProcessor` + typed `ValueState`) — the modern successor
to `applyInPandasWithState` that :mod:`.sessionize` uses.

Same semantics as :func:`.sessionize.sessionize_stream` (rows closer
than the gap chain; a longer gap closes-and-emits; the open tail
survives across micro-batches), same O(1)-per-key state — but the state
is a NAMED, TYPED ValueState the state store manages individually
(and the API adds TTL, timers, and initial-state hydration the old API
lacked; none are needed here).  Kept alongside the old operator, with a
parity test, so the engine demonstrates both stateful surfaces.

Runtime dependency: the transformWithState driver worker speaks
protobuf to the state store (``google.protobuf``) — absent from this
container, so the parity test importorskips; on a real cluster the
dependency ships with Spark's protobuf jars + ``pip install protobuf``.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .sessionize import SESSION_SCHEMA, _STATE_SCHEMA


class _SessionProcessor(StatefulProcessor):
    """One open session per key in a ValueState; closed sessions emit."""

    def __init__(self, gap_minutes: int, ts_col: str, value_col: str):
        self._gap = pd.Timedelta(minutes=gap_minutes)
        self._ts_col = ts_col
        self._value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("open_session", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True).sort_values(
            self._ts_col
        )
        if self._state.exists():
            start, last, n, tv = self._state.get()
            cur = [pd.Timestamp(start), pd.Timestamp(last), int(n), float(tv)]
        else:
            cur = None
        closed = []
        for r in pdf.itertuples(index=False):
            ts = getattr(r, self._ts_col)
            val = float(getattr(r, self._value_col))
            if cur is None:
                cur = [ts, ts, 1, val]
            elif ts - cur[1] > self._gap:
                closed.append((key[0], cur[0], cur[1], cur[2], cur[3]))
                cur = [ts, ts, 1, val]
            else:
                cur[1], cur[2], cur[3] = ts, cur[2] + 1, cur[3] + val
        self._state.update(
            (cur[0].to_pydatetime(), cur[1].to_pydatetime(), cur[2], cur[3])
        )
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "total_value",
            ],
        )

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key sessionization via ``transformWithStateInPandas`` —
    result-identical to :func:`.sessionize.sessionize_stream`.

    FIXED-SCHEMA CONSTRAINT: the output column set is pinned to
    ``SESSION_SCHEMA`` (``user_id, session_start, session_end,
    n_events, total_value``) regardless of ``key_col`` — the processor
    emits the key under the literal name ``user_id``.  ``key_col`` /
    ``ts_col`` / ``value_col`` only select INPUT columns (inherited
    from the legacy operator's signature).  Also note: the Spark-4
    StatefulProcessor worker requires ``google.protobuf``; in
    environments without it this path fails at runtime and the
    ``applyInPandasWithState`` sessionizer (:mod:`.sessionize`) is the
    executable twin — run tests/test_streaming_multimodal.py's TWS
    parity test once on a protobuf-equipped cluster before relying on
    this port."""
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_SessionProcessor(gap_minutes, ts_col, value_col),
        outputStructType=SESSION_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
