"""Feature models — the reconstructed FARE_DAILY_FEATURES and friends.

`ANALYTICS.FARE_DAILY_FEATURES` is consumed but never defined in the
reference (`dags/fare_model_training_dag.py:27-43`); per SURVEY §0 its
semantics are mart_daily_metrics + daily weather + precip flag + window
features: LAG(avg_fare,1), LAG(avg_fare,7), 7-day trailing mean
(`Implementation Plan…md:156-161`).

Scale note: the lag/MA window is a single unpartitioned `ORDER BY trip_date`
window — safe *only* because the frame is daily-grain (bounded by calendar
days, thousands of rows regardless of raw-data scale). Row-grain windows in
this engine always carry a partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_weather_forecast(weather: DataFrame) -> DataFrame:
    """A7 (`dags/weather_future_realtime.py:30-36`): daily mean temp/humidity
    + precip-day flag (1 if any precipitation fell that day). The testdata
    feed has no precipitation field; precip proxy := max(humidity-80, 0),
    mirrored exactly in the oracle."""
    precip = F.when(F.col("humidity_pct") > 80, F.col("humidity_pct") - 80).otherwise(0)
    return weather.groupBy(F.to_date("observed_at").alias("forecast_date")).agg(
        F.avg("temp_f").alias("avg_temperature"),
        F.avg("humidity_pct").alias("avg_humidity"),
        (F.sum(precip) > 0).cast("int").alias("is_precip_day"),
    )


SQL_DAILY_WEATHER_FORECAST = """
daily_forecast AS (
    SELECT
        CAST(observed_at AS DATE) AS forecast_date,
        avg(temp_f) AS avg_temperature,
        avg(humidity_pct) AS avg_humidity,
        CAST(sum(CASE WHEN humidity_pct > 80 THEN humidity_pct - 80 ELSE 0 END) > 0 AS INTEGER) AS is_precip_day
    FROM weather
    GROUP BY 1
)
"""


def fare_daily_features(mart_daily: DataFrame, daily_forecast: DataFrame) -> DataFrame:
    """FARE_DAILY_FEATURES (schema per consuming SELECTs,
    `dags/fare_model_training_dag.py:27-43`): daily metrics + weather +
    is_precip_day + lag1/lag7/ma7 of avg_fare."""
    d = mart_daily.join(
        F.broadcast(
            daily_forecast.select(
                F.col("forecast_date"), F.col("is_precip_day")
            )
        ),
        mart_daily.trip_date == F.col("forecast_date"),
        "left",
    ).drop("forecast_date")
    # Unpartitioned window is safe BY CONSTRUCTION: input is daily-grain
    # (one row per date — ≤37k rows even for a century of data), so the
    # single-partition sort Spark warns about is bounded regardless of raw
    # trip volume. Lag/MA features need the full date sequence; partitioning
    # (e.g. by year) would corrupt values at partition boundaries.
    w = Window.orderBy("trip_date")
    return d.select(
        "trip_date",
        "avg_fare",
        "trip_count",
        "avg_distance",
        "weekend_trip_count",
        "weekday_trip_count",
        F.col("avg_daily_temperature"),
        F.col("avg_daily_humidity"),
        F.coalesce(F.col("is_precip_day"), F.lit(0)).alias("is_precip_day"),
        F.lag("avg_fare", 1).over(w).alias("avg_fare_lag1"),
        F.lag("avg_fare", 7).over(w).alias("avg_fare_lag7"),
        F.avg("avg_fare").over(w.rowsBetween(-6, 0)).alias("avg_fare_ma7"),
    )


SQL_FARE_DAILY_FEATURES = """
fare_daily_features AS (
    SELECT
        m.trip_date,
        m.avg_fare,
        m.trip_count,
        m.avg_distance,
        m.weekend_trip_count,
        m.weekday_trip_count,
        m.avg_daily_temperature,
        m.avg_daily_humidity,
        coalesce(f.is_precip_day, 0) AS is_precip_day,
        lag(m.avg_fare, 1) OVER (ORDER BY m.trip_date) AS avg_fare_lag1,
        lag(m.avg_fare, 7) OVER (ORDER BY m.trip_date) AS avg_fare_lag7,
        avg(m.avg_fare) OVER (
            ORDER BY m.trip_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
        ) AS avg_fare_ma7
    FROM mart_daily_metrics m
    LEFT JOIN daily_forecast f ON f.forecast_date = m.trip_date
)
"""


def zone_demand(stg_trips: DataFrame) -> DataFrame:
    """A6 (`dags/zone_forecast.py:37-45`): per-zone daily demand rollup."""
    return stg_trips.groupBy(
        F.col("pickup_zone_id"),
        F.to_date("pickup_datetime").alias("trip_date"),
    ).agg(
        F.count(F.lit(1)).alias("trip_count"),
        F.avg("trip_distance").alias("avg_distance"),
        F.avg("total_amount").alias("avg_amount"),
    )


SQL_ZONE_DEMAND = """
zone_demand AS (
    SELECT
        pickup_zone_id,
        CAST(pickup_datetime AS DATE) AS trip_date,
        count(*) AS trip_count,
        avg(trip_distance) AS avg_distance,
        avg(total_amount) AS avg_amount
    FROM stg_trips
    GROUP BY 1, 2
)
"""
