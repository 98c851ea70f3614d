"""Streaming exactly-once dedup: `dropDuplicatesWithinWatermark` over a
natural key — the streaming face of the batch MERGE dedup (operators/
merge.py), for sources that re-deliver (at-least-once buses, replayed
files).

Why the *WithinWatermark* variant: plain `dropDuplicates` on a stream
keeps every key ever seen in state forever — unbounded state at 100 TB.
Bounding dedup memory by the event-time watermark keeps state
O(keys-per-delay-window) regardless of stream lifetime: a re-delivery is
dropped iff it arrives within `delay` of the first copy, which is exactly
the redelivery window real buses guarantee.

Reference parity: dedup-upsert MERGE semantics
(`/root/reference/dags/etl_spark_historical.py:349-380`), re-expressed for
Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """First-writer-wins streaming dedup with state bounded by `delay`."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
