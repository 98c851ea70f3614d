"""Time-series regularization operators: spine generation + gap-fill.

The reference repairs hourly gaps by re-fetching or synthesizing missing
rows (`dags/weather_historical_backfill.py`); the general engine operator
is: build the complete time spine between min and max, left-join the
observations, and forward-fill within each series.

Scale notes: the spine is generated with `sequence` + `explode` from ONE
aggregate row — no driver loop, no range collect. The forward-fill window
is per-series (`partitionBy(series)`), so state never crosses series and
Spark parallelizes by series key. A global (unpartitioned) fill would
single-partition; callers must pass the series columns.
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
) -> DataFrame:
    """Hourly resample with forward-fill: one row per (series, hour) over the
    complete spine; missing values take the most recent earlier observation
    in the same series (NULL until the first observation)."""
    hourly = df.groupBy(
        *series_cols, F.date_trunc("hour", ts_col).alias("hour_ts")
    ).agg(*[F.avg(c).alias(c) for c in value_cols])
    spine = hour_spine(df, ts_col)
    series = df.select(*series_cols).distinct()
    grid = series.crossJoin(spine)
    joined = grid.join(hourly, [*series_cols, "hour_ts"], "left")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        *series_cols,
        "hour_ts",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"{c}_filled")
            for c in value_cols
        ],
        *[F.col(c).isNotNull().alias(f"{c}_observed") for c in value_cols],
    )
    return filled
