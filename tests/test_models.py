"""Model-DAG tests over NYC-shaped fixtures (FIXTURES.md §1-2): the dbt
declarative suite ported to assertions (SURVEY §5a) + pipeline wiring."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.plans import (
    intermediate,
    marts,
    nyc_views,
    pipeline,
    staging,
)


@pytest.fixture(scope="module")
def trips(spark, sf_dir):
    return nyc_views.trips_from_events(nyc_views.load_tables(spark, sf_dir)["events"])


@pytest.fixture(scope="module")
def weather(spark, sf_dir):
    return nyc_views.weather_from_events(
        nyc_views.load_tables(spark, sf_dir)["events"]
    )


def test_staging_filters_all_quality_predicates(spark, trips):
    stg = staging.stg_taxi_trips(trips)
    bad = stg.where(
        F.col("pickup_datetime").isNull()
        | F.col("dropoff_datetime").isNull()
        | F.col("pickup_zone_id").isNull()
        | F.col("dropoff_zone_id").isNull()
        | (F.col("trip_distance") <= 0)
        | (F.col("total_amount") <= 0)
        | (F.col("dropoff_datetime") <= F.col("pickup_datetime"))
    )
    assert bad.count() == 0
    assert stg.count() < trips.count()  # filters actually removed rows


def test_enriched_speed_guard_and_flags(spark, trips):
    enr = intermediate.int_trips_enriched(staging.stg_taxi_trips(trips))
    # no NULL/negative-speed artifacts
    assert enr.where(F.col("avg_speed_mph").isNull()).count() == 0
    assert enr.where((F.col("trip_duration_minutes") <= 0) & (F.col("avg_speed_mph") != 0)).count() == 0
    # anomaly flags fire both ways
    assert enr.where(F.col("is_trip_duration_anomaly")).count() > 0
    assert enr.where(~F.col("is_trip_duration_anomaly")).count() > 0
    # weekend flag consistent with day_of_week ∈ {0,6}
    assert (
        enr.where(F.col("is_weekend") != F.col("day_of_week").isin(0, 6)).count() == 0
    )


def test_weather_hourly_unique_per_hour_city(spark, weather):
    wh = intermediate.int_weather_hourly(staging.stg_weather(weather))
    dup = (
        wh.groupBy("observation_hour", "city")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    multi = wh.where(F.col("observation_count") > 1)
    assert multi.count() > 0  # fixture guarantees multi-observation hours


def test_mart_trips_weather_left_join_keeps_all_hours(spark, trips, weather):
    enr = intermediate.int_trips_enriched(staging.stg_taxi_trips(trips))
    wh = intermediate.int_weather_hourly(staging.stg_weather(weather))
    mart = marts.mart_trips_weather(enr, wh)
    n_hours = enr.select("pickup_hour").distinct().count()
    joined_hours = mart.select("hour_ts").distinct().count()
    assert joined_hours == n_hours  # LEFT join loses no trip hours
    assert mart.where(F.col("avg_temperature_fahrenheit").isNull()).count() > 0


def test_mart_daily_conditional_counts_sum_to_total(spark, trips, weather):
    enr = intermediate.int_trips_enriched(staging.stg_taxi_trips(trips))
    wh = intermediate.int_weather_hourly(staging.stg_weather(weather))
    daily = marts.mart_daily_metrics(enr, wh)
    bad = daily.where(
        F.col("weekend_trip_count") + F.col("weekday_trip_count") != F.col("trip_count")
    )
    assert bad.count() == 0


def test_zone_analysis_having_floor(spark, trips):
    enr = intermediate.int_trips_enriched(staging.stg_taxi_trips(trips))
    mza = marts.mart_zone_analysis(enr)
    assert mza.where(F.col("trip_count") < 10).count() == 0
    assert mza.where(~F.col("peak_hour").between(0, 23)).count() == 0


def test_pipeline_run_models_quality_green(spark, trips, weather):
    run = pipeline.run_models(trips, weather, run_quality=True)
    failing = [r for r in run.quality_results if r.status == "fail"]
    assert failing == [], f"quality failures: {failing}"
    assert run.fare_daily_features.count() > 0


def test_pipeline_freshness_wall_clock_trips_sla_on_stale_sources(
    spark, trips, weather
):
    """The dbt-source-freshness operational mode: run_models grades source
    ages against the wall clock by default. The historical fixtures are
    years old, so both sources must trip their warn/error thresholds —
    and the models still build (freshness reports, it doesn't abort)."""
    run = pipeline.run_models(trips, weather, run_quality=False)
    got = {r.source: r for r in run.freshness_results}
    assert set(got) == {"raw_taxi_trips", "raw_weather"}
    for r in got.values():
        assert r.status in {"warn", "fail"}
        assert r.age_hours > 48  # fixtures are far past every SLA
    assert got["raw_weather"].status == "fail"  # 4h error threshold
    assert run.mart_daily_metrics.count() > 0  # build proceeded

    # a pinned as_of at the newest observation makes that source fresh again
    newest = weather.agg(F.max("observed_at")).collect()[0][0]
    pinned = pipeline.run_models(
        trips,
        weather,
        run_quality=False,
        freshness_as_of=str(newest),
    )
    pinned_got = {r.source: r for r in pinned.freshness_results}
    assert pinned_got["raw_weather"].status == "pass"

    # and opting out skips the stage entirely
    off = pipeline.run_models(trips, weather, run_quality=False, run_freshness=False)
    assert off.freshness_results == []


def test_ingest_trips_merge_idempotent(spark, trips):
    first = pipeline.ingest_trips(trips, None)
    merged = pipeline.ingest_trips(trips, first)
    assert merged.count() == first.count()  # re-ingesting same month adds 0


def test_fare_daily_features_window_semantics(spark, trips, weather):
    run = pipeline.run_models(trips, weather, run_quality=False)
    rows = sorted(run.fare_daily_features.collect(), key=lambda r: r.trip_date)
    for i, r in enumerate(rows):
        if i >= 1:
            assert r.avg_fare_lag1 == pytest.approx(rows[i - 1].avg_fare)
        else:
            assert r.avg_fare_lag1 is None
        if i >= 7:
            assert r.avg_fare_lag7 == pytest.approx(rows[i - 7].avg_fare)
        lo = max(0, i - 6)
        expect_ma = sum(x.avg_fare for x in rows[lo : i + 1]) / (i + 1 - lo)
        assert r.avg_fare_ma7 == pytest.approx(expect_ma)


def test_pipeline_snapshots_and_forecast_chain(spark, trips, weather):
    from datetime import datetime

    from pyspark.sql import functions as F2

    run = pipeline.run_models(trips, weather, run_quality=False)
    w1, d1 = pipeline.run_snapshots(run, None, None, datetime(2026, 1, 1))
    # first run: everything open
    assert w1.where(F2.col("dbt_valid_to").isNotNull()).count() == 0
    # second run with identical sources: nothing closes, nothing inserts
    w2, d2 = pipeline.run_snapshots(run, w1, d1, datetime(2026, 1, 2))
    assert w2.count() == w1.count()
    assert d2.count() == d1.count()
    assert d2.where(F2.col("dbt_valid_to").isNotNull()).count() == 0

    tr, fc, ev = pipeline.run_forecast_chain(spark, run)
    assert fc.count() == 7
    assert ev.where(F2.col("row_type") == "summary").count() == 1
    assert tr.mae >= 0.0


def test_sql_surface_over_registered_views(spark, trips, weather):
    run = pipeline.run_models(trips, weather, run_quality=False)
    names = pipeline.register_views(spark, run)
    assert "mart_daily_metrics" in names
    out = spark.sql(
        """
        SELECT d.trip_date, d.trip_count, f.avg_fare_ma7
        FROM mart_daily_metrics d
        JOIN fare_daily_features f USING (trip_date)
        WHERE d.trip_count > 0
        ORDER BY d.trip_date
        """
    )
    rows = out.collect()
    assert len(rows) > 0
    assert rows == sorted(rows, key=lambda r: r.trip_date)


def test_docs_manifest_lineage_and_schemas(spark, trips, weather, tmp_path):
    """dbt-docs parity artifact: every ModelRun output is documented with
    its live schema; edges form a DAG whose topo order places every model
    after its upstreams; files land on disk."""
    import json

    from nyc_taxi_data_warehouse_spark.plans import docs

    run = pipeline.run_models(trips, weather, run_quality=False)
    manifest = docs.generate_manifest(run)

    documented = {m for m, e in manifest["models"].items() if "columns" in e}
    assert documented == set(docs._RUN_ATTRS)
    assert [c["name"] for c in manifest["models"]["mart_daily_metrics"]["columns"]] == (
        run.mart_daily_metrics.columns
    )

    order = docs.topo_order()
    pos = {m: i for i, m in enumerate(order)}
    for up, down in manifest["edges"]:
        assert pos[up] < pos[down], (up, down)

    jpath, mpath = docs.write_docs(run, str(tmp_path / "docs"))
    assert json.load(open(jpath)) == manifest
    md = open(mpath).read()
    assert "## mart_trips_weather  `mart`" in md and "| hour_ts |" in md
