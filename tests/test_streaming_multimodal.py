"""Structured Streaming parity test (§2.9 stretch) + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.plans import intermediate, nyc_views, staging
from nyc_taxi_data_warehouse_spark.sources import multimodal
from nyc_taxi_data_warehouse_spark.streaming import weather_stream


def test_streaming_hourly_agg_matches_batch(spark, sf_dir, tmp_path):
    weather = nyc_views.weather_from_events(
        nyc_views.load_tables(spark, sf_dir)["events"]
    )
    src = str(tmp_path / "weather_feed")
    weather.write.mode("overwrite").parquet(src)

    stream = weather_stream.read_weather_stream(spark, src)
    agg = weather_stream.hourly_weather_stream(stream)
    q = weather_stream.run_available_now(agg, "wh_test")
    q.awaitTermination(120)

    got = spark.table("wh_test")
    batch = intermediate.int_weather_hourly(staging.stg_weather(weather))
    # streaming path filters the same staging predicate; compare rollups
    cols = ["observation_hour", "city", "observation_count", "weather_description"]
    g = {tuple(r) for r in got.select(*cols).collect()}
    b = {tuple(r) for r in batch.select(*cols).collect()}
    assert g == b
    q.stop()


def test_multimodal_decode_stub_contract(spark):
    rows = [
        ("m1", "image", bytearray(b"\x01\x02\x03\x04"), 2, 2, None),
        ("m2", "image", bytearray(b""), 0, 0, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_image_batch(
        multimodal.attach_media_metadata(df), use_fake=True
    )
    got = {r.media_id: r for r in out.collect()}
    assert got["m1"].n_bytes == 4
    assert got["m1"].mean_byte == pytest.approx(2.5)
    assert len(got["m1"].feature_hash) == 32
    assert got["m2"].mean_byte == 0.0


def test_multimodal_real_decode_is_explicitly_stubbed(spark):
    df = spark.createDataFrame([], multimodal.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_batch(df, use_fake=False)


def test_frame_sample_plan_shape(spark):
    df = spark.createDataFrame(
        [("m1", "video", bytearray(b"x" * 90000), 0, 0, 90000)],
        multimodal.MEDIA_SCHEMA,
    )
    plan = multimodal.frame_sample_plan(multimodal.attach_media_metadata(df))
    rows = plan.collect()
    assert len(rows) == 4  # indices 0,30,60,90
    assert {r.frame_idx for r in rows} == {0, 30, 60, 90}
