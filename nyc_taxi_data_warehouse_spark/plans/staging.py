"""Staging models — the dbt staging layer as lazy DataFrame functions.

dbt materializes staging as *views* (`dbt_project.yml:32-42`); Spark's lazy
DataFrames give the same recompute-on-demand semantics for free, and Catalyst
pushes these filters into the parquet scan (predicate pushdown), so staging
costs nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stg_taxi_trips(trips: DataFrame) -> DataFrame:
    """Quality-filtered trip staging (`models/staging/stg_taxi_trips.sql:13-39`):
    4 NOT NULLs, positive distance/amount, dropoff strictly after pickup."""
    c = F.col
    return trips.where(
        c("pickup_datetime").isNotNull()
        & c("dropoff_datetime").isNotNull()
        & c("pickup_zone_id").isNotNull()
        & c("dropoff_zone_id").isNotNull()
        & (c("trip_distance") > 0)
        & (c("total_amount") > 0)
        & (c("dropoff_datetime") > c("pickup_datetime"))
    ).select(
        "pickup_datetime",
        "dropoff_datetime",
        "pickup_zone_id",
        "dropoff_zone_id",
        "passenger_count",
        "trip_distance",
        "total_amount",
        "load_ts",
    )


SQL_STG_TRIPS = """
stg_trips AS (
    SELECT
        pickup_datetime, dropoff_datetime, pickup_zone_id, dropoff_zone_id,
        passenger_count, trip_distance, total_amount, load_ts
    FROM trips
    WHERE pickup_datetime IS NOT NULL
      AND dropoff_datetime IS NOT NULL
      AND pickup_zone_id IS NOT NULL
      AND dropoff_zone_id IS NOT NULL
      AND trip_distance > 0
      AND total_amount > 0
      AND dropoff_datetime > pickup_datetime
)
"""


def stg_weather(weather: DataFrame) -> DataFrame:
    """Weather staging rename+filter (`models/staging/stg_weather.sql:12-34`).

    Deviation from reference: carries `obs_id` through as a deterministic
    tie-break for the hourly argmax (reference's max_by is tie-ambiguous).
    """
    c = F.col
    return weather.where(
        c("observed_at").isNotNull() & c("temp_f").isNotNull()
    ).select(
        "observed_at",
        "load_ts",
        "city",
        c("temp_f").alias("temperature_fahrenheit"),
        c("weather_desc").alias("weather_description"),
        c("humidity_pct").alias("humidity_percent"),
        "raw_json",
        "obs_id",
    )


SQL_STG_WEATHER = """
stg_weather AS (
    SELECT
        observed_at, load_ts, city,
        temp_f AS temperature_fahrenheit,
        weather_desc AS weather_description,
        humidity_pct AS humidity_percent,
        raw_json, obs_id
    FROM weather
    WHERE observed_at IS NOT NULL AND temp_f IS NOT NULL
)
"""
