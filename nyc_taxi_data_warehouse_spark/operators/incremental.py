"""Incremental aggregate maintenance — the reference's planned
"incremental models" (`/root/reference/README.md:375`, `Implementation
Plan_ dbt ELT Pipeline with Airflow and Snowflake Analytics.md:141` list
them as future work; this engine ships them).

Instead of recomputing a mart from the full history when a late batch
arrives, keep the mart in PARTIAL-aggregate form (counts and exact integer
sums, plus min/max) and fold each delta batch in with a key-wise
re-aggregate. Only algebraic aggregates decompose this way — count, sum,
min, max, and anything derivable from them (avg = sum/count); holistic
aggregates (median, mode, distinct counts) need sketches or a recompute.

Scale shape: the fold is `union → groupBy(key)` where one side is the
(small) delta — at 100 TB the mart side is date-partitioned, so with a
date-bucketed delta only the touched partitions rejoin the shuffle
(dynamic partition overwrite on the write side, `sources/sinks.py`).
Money columns are carried as exact 1e-2-unit longs, so folding order can
never drift the totals (double accumulation is order-sensitive; integer
sums are not).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_COLS = ("trip_count", "fare_units", "min_fare_units", "max_fare_units")


def partial_daily_trips(stg_trips: DataFrame) -> DataFrame:
    """Per-day partial aggregates of a (full or delta) staged-trips batch.

    Output is closed under `merge_partials`: merging any disjoint split of
    the input reproduces the full-batch partials exactly.
    """
    units = F.floor(F.col("total_amount") * 100 + F.lit(0.5)).cast("long")
    return (
        stg_trips.select(
            F.to_date("pickup_datetime").alias("trip_date"), units.alias("__u")
        )
        .groupBy("trip_date")
        .agg(
            F.count(F.lit(1)).alias("trip_count"),
            F.sum("__u").alias("fare_units"),
            F.min("__u").alias("min_fare_units"),
            F.max("__u").alias("max_fare_units"),
        )
    )


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Fold partial-aggregate frames (base mart + delta batches) into one."""
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    return allp.groupBy("trip_date").agg(
        F.sum("trip_count").alias("trip_count"),
        F.sum("fare_units").alias("fare_units"),
        F.min("min_fare_units").alias("min_fare_units"),
        F.max("max_fare_units").alias("max_fare_units"),
    )


def finalize_daily(partials: DataFrame) -> DataFrame:
    """Derive the user-facing mart columns from the partial state."""
    return partials.select(
        "trip_date",
        "trip_count",
        (F.col("fare_units") / 100.0).alias("total_fare"),
        (F.col("fare_units") / F.col("trip_count") / 100.0).alias("avg_fare"),
        (F.col("min_fare_units") / 100.0).alias("min_fare"),
        (F.col("max_fare_units") / 100.0).alias("max_fare"),
    )
