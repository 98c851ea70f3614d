"""Golden tests for the Snowflake-compat expression layer (SURVEY §2.5) —
the semantic edges called out as risks in SURVEY §7: minute-boundary
datediff (E1), three weekday numbering conventions (E5/E7/E17), 3-letter
daynames (E6), dbt surrogate keys (E15)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.functions import compat


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


def test_datediff_minute_counts_boundaries(spark):
    # 10:00:59 → 10:01:01 crosses one minute boundary (2s elapsed)
    a = F.lit("2024-01-01 10:00:59").cast("timestamp")
    b = F.lit("2024-01-01 10:01:01").cast("timestamp")
    assert _one(spark, compat.datediff_minute(a, b)) == 1
    # 59m59s elapsed but 59 boundaries
    c = F.lit("2024-01-01 10:59:59").cast("timestamp")
    a2 = F.lit("2024-01-01 10:00:00").cast("timestamp")
    assert _one(spark, compat.datediff_minute(a2, c)) == 59
    # negative direction
    assert _one(spark, compat.datediff_minute(c, a2)) == -59


def test_dayofweek0_sunday_based(spark):
    sun = F.lit("2024-01-07 12:00:00").cast("timestamp")
    sat = F.lit("2024-01-06 12:00:00").cast("timestamp")
    mon = F.lit("2024-01-01 12:00:00").cast("timestamp")
    assert _one(spark, compat.dayofweek0(sun)) == 0
    assert _one(spark, compat.dayofweek0(sat)) == 6
    assert _one(spark, compat.dayofweek0(mon)) == 1


def test_is_weekend_matches_snowflake_0_6(spark):
    assert _one(spark, compat.is_weekend(F.lit("2024-01-06 00:00:00").cast("timestamp")))
    assert _one(spark, compat.is_weekend(F.lit("2024-01-07 00:00:00").cast("timestamp")))
    assert not _one(spark, compat.is_weekend(F.lit("2024-01-05 00:00:00").cast("timestamp")))


def test_dayname3(spark):
    assert _one(spark, compat.dayname3(F.lit("2024-01-01 00:00:00").cast("timestamp"))) == "Mon"
    assert _one(spark, compat.dayname3(F.lit("2024-01-07 00:00:00").cast("timestamp"))) == "Sun"


def test_surrogate_key_null_coalesces_to_empty(spark):
    import hashlib

    got = _one(spark, compat.surrogate_key(F.lit("New York"), F.lit(None)))
    assert got == hashlib.md5(b"New York-").hexdigest()


def test_guarded_speed_zero_when_no_duration(spark):
    assert _one(spark, compat.guarded_speed_mph(F.lit(5.0), F.lit(0))) == 0.0
    assert _one(spark, compat.guarded_speed_mph(F.lit(5.0), F.lit(30))) == 10.0
