"""Mart models — the reference's three analytics tables.

- `mart_trips_weather` (`models/marts/mart_trips_weather.sql`): hourly trip
  metrics LEFT-joined to hourly weather with a residual LIKE predicate — the
  flagship query. The weather side is hour-grain (small), so Spark broadcasts
  it; the trips side aggregates map-side before the join output shuffles.
- `mart_daily_metrics` (`models/marts/mart_daily_metrics.sql`): daily rollup
  with conditional weekend/weekday counts joined to daily NYC weather.
- `mart_zone_analysis` (`models/marts/mart_zone_analysis.sql`): OD-matrix with
  peak-hour mode and HAVING floor. Reference `mode(hour_of_day)` is
  tie-ambiguous; we pin 'most frequent hour, smallest wins ties'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mart_trips_weather(enriched: DataFrame, weather_hourly: DataFrame) -> DataFrame:
    t, w = enriched.alias("t"), weather_hourly.alias("w")
    joined = t.join(
        F.broadcast(w),
        (F.col("w.observation_hour") == F.col("t.pickup_hour"))
        & F.lower(F.col("w.city")).like("%new york%"),
        "left",
    )
    return joined.groupBy(
        F.col("t.pickup_hour").alias("hour_ts"),
        F.col("w.avg_temperature_fahrenheit").alias("avg_temperature_fahrenheit"),
        F.col("w.avg_humidity_percent").alias("avg_humidity_percent"),
        F.col("w.weather_description").alias("weather_description"),
        F.col("t.hour_of_day").alias("hour_of_day"),
        F.col("t.day_of_week").alias("day_of_week"),
        F.col("t.day_name").alias("day_name"),
        F.col("t.is_weekend").alias("is_weekend"),
    ).agg(
        F.count(F.lit(1)).alias("trip_count"),
        F.avg("t.trip_distance").alias("avg_trip_distance"),
        F.avg("t.total_amount").alias("avg_total_amount"),
        F.avg("t.trip_duration_minutes").alias("avg_trip_duration_minutes"),
        F.avg("t.avg_speed_mph").alias("avg_speed_mph"),
    )


SQL_MART_TRIPS_WEATHER = """
mart_trips_weather AS (
    SELECT
        t.pickup_hour AS hour_ts,
        w.avg_temperature_fahrenheit,
        w.avg_humidity_percent,
        w.weather_description,
        t.hour_of_day,
        t.day_of_week,
        t.day_name,
        t.is_weekend,
        count(*) AS trip_count,
        avg(t.trip_distance) AS avg_trip_distance,
        avg(t.total_amount) AS avg_total_amount,
        avg(t.trip_duration_minutes) AS avg_trip_duration_minutes,
        avg(t.avg_speed_mph) AS avg_speed_mph
    FROM enriched t
    LEFT JOIN weather_hourly w
        ON w.observation_hour = t.pickup_hour
       AND lower(w.city) LIKE '%new york%'
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
)
"""


def mart_daily_metrics(enriched: DataFrame, weather_hourly: DataFrame) -> DataFrame:
    """Daily trips × daily weather. Deviation: `trip_date` is DATE (reference
    keeps `date_trunc('day')` timestamps); grouping semantics identical."""
    daily_trips = enriched.groupBy(
        F.to_date("pickup_datetime").alias("trip_date")
    ).agg(
        F.count(F.lit(1)).alias("trip_count"),
        F.sum("total_amount").alias("total_revenue"),
        F.avg("total_amount").alias("avg_fare"),
        F.avg("trip_distance").alias("avg_distance"),
        F.avg("trip_duration_minutes").alias("avg_duration_minutes"),
        F.avg("passenger_count").alias("avg_passenger_count"),
        F.sum(F.when(F.col("is_weekend"), 1).otherwise(0))
        .cast("long")
        .alias("weekend_trip_count"),
        F.sum(F.when(~F.col("is_weekend"), 1).otherwise(0))
        .cast("long")
        .alias("weekday_trip_count"),
    )
    daily_weather = (
        weather_hourly.where(F.col("city") == "New York")
        .groupBy(F.to_date("observation_hour").alias("weather_date"))
        .agg(
            F.avg("avg_temperature_fahrenheit").alias("avg_daily_temperature"),
            F.min("min_temperature_fahrenheit").alias("min_daily_temperature"),
            F.max("max_temperature_fahrenheit").alias("max_daily_temperature"),
            F.avg("avg_humidity_percent").alias("avg_daily_humidity"),
        )
    )
    dt, dw = daily_trips.alias("dt"), daily_weather.alias("dw")
    return dt.join(
        F.broadcast(dw), F.col("dw.weather_date") == F.col("dt.trip_date"), "left"
    ).select(
        "dt.trip_date",
        "dt.trip_count",
        "dt.total_revenue",
        "dt.avg_fare",
        "dt.avg_distance",
        "dt.avg_duration_minutes",
        "dt.avg_passenger_count",
        "dt.weekend_trip_count",
        "dt.weekday_trip_count",
        "dw.avg_daily_temperature",
        "dw.min_daily_temperature",
        "dw.max_daily_temperature",
        "dw.avg_daily_humidity",
    )


SQL_MART_DAILY_METRICS = """
daily_trips AS (
    SELECT
        CAST(pickup_datetime AS DATE) AS trip_date,
        count(*) AS trip_count,
        sum(total_amount) AS total_revenue,
        avg(total_amount) AS avg_fare,
        avg(trip_distance) AS avg_distance,
        avg(trip_duration_minutes) AS avg_duration_minutes,
        avg(passenger_count) AS avg_passenger_count,
        CAST(sum(CASE WHEN is_weekend THEN 1 ELSE 0 END) AS BIGINT) AS weekend_trip_count,
        CAST(sum(CASE WHEN NOT is_weekend THEN 1 ELSE 0 END) AS BIGINT) AS weekday_trip_count
    FROM enriched
    GROUP BY 1
),
daily_weather AS (
    SELECT
        CAST(observation_hour AS DATE) AS weather_date,
        avg(avg_temperature_fahrenheit) AS avg_daily_temperature,
        min(min_temperature_fahrenheit) AS min_daily_temperature,
        max(max_temperature_fahrenheit) AS max_daily_temperature,
        avg(avg_humidity_percent) AS avg_daily_humidity
    FROM weather_hourly
    WHERE city = 'New York'
    GROUP BY 1
),
mart_daily_metrics AS (
    SELECT
        dt.trip_date, dt.trip_count, dt.total_revenue, dt.avg_fare,
        dt.avg_distance, dt.avg_duration_minutes, dt.avg_passenger_count,
        dt.weekend_trip_count, dt.weekday_trip_count,
        dw.avg_daily_temperature, dw.min_daily_temperature,
        dw.max_daily_temperature, dw.avg_daily_humidity
    FROM daily_trips dt
    LEFT JOIN daily_weather dw ON dw.weather_date = dt.trip_date
)
"""


def mart_zone_analysis(enriched: DataFrame) -> DataFrame:
    """OD zone-pair mart. peak_hour = deterministic mode(hour_of_day):
    highest count wins, smallest hour breaks ties (reference `mode()` at
    `mart_zone_analysis.sql:35` leaves ties undefined)."""
    pair_agg = enriched.groupBy("pickup_zone_id", "dropoff_zone_id").agg(
        F.count(F.lit(1)).alias("trip_count"),
        F.avg("trip_distance").alias("avg_trip_distance"),
        F.avg("total_amount").alias("avg_total_amount"),
        F.avg("trip_duration_minutes").alias("avg_trip_duration_minutes"),
        F.avg("passenger_count").alias("avg_passenger_count"),
        F.sum(F.when(F.col("is_weekend"), 1).otherwise(0))
        .cast("long")
        .alias("weekend_trip_count"),
        F.sum(F.when(~F.col("is_weekend"), 1).otherwise(0))
        .cast("long")
        .alias("weekday_trip_count"),
    )
    hour_counts = enriched.groupBy("pickup_zone_id", "dropoff_zone_id", "hour_of_day").agg(
        F.count(F.lit(1)).alias("hour_count")
    )
    win = Window.partitionBy("pickup_zone_id", "dropoff_zone_id").orderBy(
        F.desc("hour_count"), F.asc("hour_of_day")
    )
    peak = (
        hour_counts.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select("pickup_zone_id", "dropoff_zone_id", F.col("hour_of_day").alias("peak_hour"))
    )
    return (
        pair_agg.join(peak, ["pickup_zone_id", "dropoff_zone_id"])
        .where(F.col("trip_count") >= 10)
    )


SQL_MART_ZONE_ANALYSIS = """
pair_agg AS (
    SELECT
        pickup_zone_id, dropoff_zone_id,
        count(*) AS trip_count,
        avg(trip_distance) AS avg_trip_distance,
        avg(total_amount) AS avg_total_amount,
        avg(trip_duration_minutes) AS avg_trip_duration_minutes,
        avg(passenger_count) AS avg_passenger_count,
        CAST(sum(CASE WHEN is_weekend THEN 1 ELSE 0 END) AS BIGINT) AS weekend_trip_count,
        CAST(sum(CASE WHEN NOT is_weekend THEN 1 ELSE 0 END) AS BIGINT) AS weekday_trip_count
    FROM enriched
    GROUP BY 1, 2
),
hour_counts AS (
    SELECT pickup_zone_id, dropoff_zone_id, hour_of_day, count(*) AS hour_count
    FROM enriched
    GROUP BY 1, 2, 3
),
peak AS (
    SELECT pickup_zone_id, dropoff_zone_id, hour_of_day AS peak_hour
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY pickup_zone_id, dropoff_zone_id
            ORDER BY hour_count DESC, hour_of_day ASC
        ) AS rn
        FROM hour_counts
    )
    WHERE rn = 1
),
mart_zone_analysis AS (
    SELECT p.*, k.peak_hour
    FROM pair_agg p
    JOIN peak k USING (pickup_zone_id, dropoff_zone_id)
    WHERE p.trip_count >= 10
)
"""
