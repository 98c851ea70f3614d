"""Time-series regularization operators: spine generation + gap-fill.

The reference repairs hourly gaps by re-fetching or synthesizing missing
rows (`dags/weather_historical_backfill.py`); the general engine operator
is: build the complete time spine between min and max, left-join the
observations, and forward-fill within each series.

Scale notes: the spine is generated with `sequence` + `explode` from ONE
aggregate row — no driver loop, no range collect. The forward-fill is
two-pass bucketed: pass 1 fills within (series, time-bucket) window
partitions; pass 2 forward-fills per-bucket carry values over the tiny
(series, bucket) summary and joins them back (broadcast-sized). Parallelism
is therefore #series × #buckets, not #series — a long history with few
series still spreads across the cluster instead of serializing one window
partition per series.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hour_spine(df: DataFrame, ts_col: str) -> DataFrame:
    """Every hour between floor(min(ts)) and floor(max(ts)), one row each."""
    bounds = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    return bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    series_cols: Sequence[str],
    value_cols: Sequence[str],
    bucket: str = "day",
) -> DataFrame:
    """Hourly resample with forward-fill: one row per (series, hour) over the
    complete spine; missing values take the most recent earlier observation
    in the same series (NULL until the first observation).

    Two-pass bucketed fill (semantics identical to one per-series window):

    1. within-bucket: `last(ignorenulls)` over (series, `bucket`) partitions
       — the heavy pass, parallel in #series × #buckets;
    2. carry: per-bucket last filled value (one row per series × bucket),
       forward-filled over buckets with strictly-earlier frame, joined back
       (summary is broadcast-sized) and coalesced under pass 1.
    """
    hourly = df.groupBy(
        *series_cols, F.date_trunc("hour", ts_col).alias("hour_ts")
    ).agg(*[F.avg(c).alias(c) for c in value_cols])
    spine = hour_spine(df, ts_col)
    series = df.select(*series_cols).distinct()
    grid = series.crossJoin(spine)
    joined = grid.join(hourly, [*series_cols, "hour_ts"], "left").withColumn(
        "__b", F.date_trunc(bucket, "hour_ts")
    )
    w_in = (
        Window.partitionBy(*series_cols, "__b")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = joined.select(
        *series_cols,
        "hour_ts",
        "__b",
        *[F.col(c) for c in value_cols],
        *[
            F.last(c, ignorenulls=True).over(w_in).alias(f"__{c}_wf")
            for c in value_cols
        ],
    )
    bucket_last = within.groupBy(*series_cols, "__b").agg(
        *[
            F.max_by(f"__{c}_wf", "hour_ts").alias(f"__{c}_last")
            for c in value_cols
        ]
    )
    w_carry = (
        Window.partitionBy(*series_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bucket_last.select(
        *series_cols,
        "__b",
        *[
            F.last(f"__{c}_last", ignorenulls=True)
            .over(w_carry)
            .alias(f"__{c}_carry")
            for c in value_cols
        ],
    )
    return within.join(F.broadcast(carry), [*series_cols, "__b"], "left").select(
        *series_cols,
        "hour_ts",
        *[
            F.coalesce(f"__{c}_wf", f"__{c}_carry").alias(f"{c}_filled")
            for c in value_cols
        ],
        *[F.col(c).isNotNull().alias(f"{c}_observed") for c in value_cols],
    )
