"""Structured Streaming re-expression of the hourly feeds (SURVEY §2.9).

The reference's "real-time" weather is a scheduled hourly batch pull
(`dags/weather_realtime_etl.py:30`); its late-data story is batch repair
(anti-join backfill J4 + MERGE idempotence S8) with freshness SLAs standing
in for watermarks (`models/staging/sources.yml:13-15,37-39`).

The streaming-native equivalent: file-source stream → 2h watermark (the
reference's warn SLA) → 1h tumbling window reproducing int_weather_hourly
(A1). `Trigger.AvailableNow` gives exactly the hourly-batch cadence while
keeping incremental state; the same code runs continuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WEATHER_STREAM_SCHEMA = StructType(
    [
        StructField("obs_id", LongType()),
        StructField("observed_at", TimestampType()),
        StructField("city", StringType()),
        StructField("temp_f", DoubleType()),
        StructField("weather_desc", StringType()),
        StructField("humidity_pct", IntegerType()),
        StructField("raw_json", StringType()),
        StructField("load_ts", TimestampType()),
    ]
)


def read_weather_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(WEATHER_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def hourly_weather_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming int_weather_hourly: watermarked 1h tumbling window.

    `max_by(desc, struct(observed_at, obs_id))` is the same deterministic
    argmax the batch model uses; dedup on obs_id guards re-delivered files
    (the streaming analogue of the MERGE idempotence).
    `dropDuplicatesWithinWatermark` keeps the dedup state BOUNDED — plain
    `dropDuplicates` would grow its key set forever on an unbounded feed."""
    w = (
        stream.withWatermark("observed_at", watermark)
        .dropDuplicatesWithinWatermark(["obs_id"])
        .where(F.col("observed_at").isNotNull() & F.col("temp_f").isNotNull())
    )
    return w.groupBy(
        F.window("observed_at", "1 hour").alias("win"), F.col("city")
    ).agg(
        F.avg("temp_f").alias("avg_temperature_fahrenheit"),
        F.min("temp_f").alias("min_temperature_fahrenheit"),
        F.max("temp_f").alias("max_temperature_fahrenheit"),
        F.avg("humidity_pct").alias("avg_humidity_percent"),
        F.expr("max_by(weather_desc, struct(observed_at, obs_id))").alias(
            "weather_description"
        ),
        F.count(F.lit(1)).alias("observation_count"),
        F.max("observed_at").alias("latest_observation_at"),
    ).select(
        F.col("win.start").alias("observation_hour"),
        "city",
        "avg_temperature_fahrenheit",
        "min_temperature_fahrenheit",
        "max_temperature_fahrenheit",
        "avg_humidity_percent",
        "weather_description",
        "observation_count",
        "latest_observation_at",
    )


def run_available_now(
    agg: DataFrame,
    query_name: str = "weather_hourly_stream",
    output_mode: str = "complete",
):
    """Drain everything currently in the source (hourly-batch cadence),
    results to an in-memory sink for inspection/tests. ``complete`` for
    windowed aggregations; ``append`` for row streams (dedup, filters)."""
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
