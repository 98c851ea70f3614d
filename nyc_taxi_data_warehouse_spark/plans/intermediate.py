"""Intermediate models — the semantics-dense enrichment layer.

`int_trips_enriched` carries the reference's Snowflake expression layer
(`models/intermediate/int_trips_enriched.sql:20-60`, E1-E10 in SURVEY §2.5)
re-expressed through the compat layer; `int_weather_hourly` is the hourly
multi-observation rollup (`models/intermediate/int_weather_hourly.sql:12-35`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import compat


def int_trips_enriched(stg_trips: DataFrame) -> DataFrame:
    c = F.col
    dur = compat.datediff_minute("pickup_datetime", "dropoff_datetime")
    return stg_trips.select(
        "pickup_datetime",
        "dropoff_datetime",
        "pickup_zone_id",
        "dropoff_zone_id",
        "passenger_count",
        "trip_distance",
        "total_amount",
        dur.alias("trip_duration_minutes"),
        compat.guarded_speed_mph(c("trip_distance"), dur).alias("avg_speed_mph"),
        F.date_trunc("hour", c("pickup_datetime")).alias("pickup_hour"),
        F.hour("pickup_datetime").alias("hour_of_day"),
        compat.dayofweek0("pickup_datetime").alias("day_of_week"),
        compat.dayname3("pickup_datetime").alias("day_name"),
        compat.is_weekend("pickup_datetime").alias("is_weekend"),
        F.when(dur < 1, F.lit(True))
        .when(dur > 180, F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_trip_duration_anomaly"),
        F.when(c("trip_distance") < 0.1, F.lit(True))
        .when(c("trip_distance") > 100, F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_trip_distance_anomaly"),
        F.when((c("passenger_count") == 0) | c("passenger_count").isNull(), F.lit(True))
        .when(c("passenger_count") > 6, F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_passenger_count_anomaly"),
        "load_ts",
    )


# DuckDB twin. date_diff('minute',...) has exactly Snowflake's
# boundary-crossing semantics; dayofweek() is already Sunday=0-based.
SQL_INT_TRIPS_ENRICHED = """
enriched AS (
    SELECT
        pickup_datetime, dropoff_datetime, pickup_zone_id, dropoff_zone_id,
        passenger_count, trip_distance, total_amount,
        date_diff('minute', pickup_datetime, dropoff_datetime) AS trip_duration_minutes,
        CASE WHEN date_diff('minute', pickup_datetime, dropoff_datetime) > 0
             THEN trip_distance / (date_diff('minute', pickup_datetime, dropoff_datetime) / 60.0)
             ELSE 0.0
        END AS avg_speed_mph,
        date_trunc('hour', pickup_datetime) AS pickup_hour,
        CAST(extract(hour FROM pickup_datetime) AS INTEGER) AS hour_of_day,
        CAST(dayofweek(pickup_datetime) AS INTEGER) AS day_of_week,
        strftime(pickup_datetime, '%a') AS day_name,
        dayofweek(pickup_datetime) IN (0, 6) AS is_weekend,
        CASE WHEN date_diff('minute', pickup_datetime, dropoff_datetime) < 1 THEN true
             WHEN date_diff('minute', pickup_datetime, dropoff_datetime) > 180 THEN true
             ELSE false
        END AS is_trip_duration_anomaly,
        CASE WHEN trip_distance < 0.1 THEN true
             WHEN trip_distance > 100 THEN true
             ELSE false
        END AS is_trip_distance_anomaly,
        CASE WHEN passenger_count = 0 OR passenger_count IS NULL THEN true
             WHEN passenger_count > 6 THEN true
             ELSE false
        END AS is_passenger_count_anomaly,
        load_ts
    FROM stg_trips
)
"""


def int_weather_hourly(stg_weather: DataFrame) -> DataFrame:
    """Hourly weather rollup with latest-description argmax.

    Reference uses `max_by(weather_description, observed_at)`
    (`int_weather_hourly.sql:25`) whose tie behavior is undefined; we pin a
    deterministic total order with `max_by(desc, struct(observed_at, obs_id))`
    — identical when there is no tie, deterministic when there is.
    """
    hour = F.date_trunc("hour", F.col("observed_at"))
    return (
        stg_weather.groupBy(
            hour.alias("observation_hour"), F.col("city")
        ).agg(
            F.avg("temperature_fahrenheit").alias("avg_temperature_fahrenheit"),
            F.min("temperature_fahrenheit").alias("min_temperature_fahrenheit"),
            F.max("temperature_fahrenheit").alias("max_temperature_fahrenheit"),
            F.avg("humidity_percent").alias("avg_humidity_percent"),
            F.expr(
                "max_by(weather_description, struct(observed_at, obs_id))"
            ).alias("weather_description"),
            F.count(F.lit(1)).alias("observation_count"),
            F.max("observed_at").alias("latest_observation_at"),
        )
    )


# DuckDB arg_max has no struct overload → rank the latest observation per
# (hour, city) with row_number (same deterministic order) and join it back.
SQL_INT_WEATHER_HOURLY = """
weather_ranked AS (
    SELECT
        date_trunc('hour', observed_at) AS observation_hour,
        city, temperature_fahrenheit, humidity_percent, weather_description,
        observed_at,
        row_number() OVER (
            PARTITION BY date_trunc('hour', observed_at), city
            ORDER BY observed_at DESC, obs_id DESC
        ) AS rn
    FROM stg_weather
),
weather_hourly AS (
    SELECT
        observation_hour,
        city,
        avg(temperature_fahrenheit) AS avg_temperature_fahrenheit,
        min(temperature_fahrenheit) AS min_temperature_fahrenheit,
        max(temperature_fahrenheit) AS max_temperature_fahrenheit,
        avg(humidity_percent) AS avg_humidity_percent,
        max(CASE WHEN rn = 1 THEN weather_description END) AS weather_description,
        count(*) AS observation_count,
        max(observed_at) AS latest_observation_at
    FROM weather_ranked
    GROUP BY observation_hour, city
)
"""
