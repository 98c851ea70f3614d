"""Round-13 additions: shared-scan pinning, bucketed signature store,
and the round's new gated queries' invariants."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _distinct_parquet_scans(df) -> set[str]:
    """Node ids of DISTINCT parquet scans in the formatted plan (the
    detail section lists each physical node once; tree re-displays of a
    shared cached subtree reuse the same id)."""
    return set(re.findall(r"\((\d+)\) Scan parquet", _formatted_plan(df)))


class TestSharedEventsScan:
    """VERDICT r12 item 5 / NOTES 'Known weak spots' since round 1: the
    weather-hourly and forecast branches must SHARE the events scan —
    one physical parquet scan node feeding both domain views through the
    cached relation, not two independent FileScans."""

    def test_trips_weather_single_events_scan(self, spark, sf_dir):
        from nyc_taxi_data_warehouse_spark.queries_nyc import q_trips_weather

        assert len(_distinct_parquet_scans(q_trips_weather(spark, sf_dir))) == 1

    def test_fare_daily_features_single_events_scan(self, spark, sf_dir):
        from nyc_taxi_data_warehouse_spark.queries_nyc import (
            q_fare_daily_features,
        )

        assert (
            len(_distinct_parquet_scans(q_fare_daily_features(spark, sf_dir)))
            == 1
        )
