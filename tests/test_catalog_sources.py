"""Catalog DDL ops (S9/S10/S16-S19) and source-discovery (S2) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.sources import catalog, readers


def test_catalog_provision_ctas_truncate_roundtrip(spark):
    # the in-memory catalog forgets tables between sessions but their
    # managed locations survive on disk — scrub both for idempotent reruns
    import shutil

    spark.sql("DROP DATABASE IF EXISTS t_cat CASCADE")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(warehouse.removeprefix("file:") + "/t_cat.db", ignore_errors=True)

    catalog.ensure_database(spark, "t_cat")
    catalog.ensure_database(spark, "t_cat")  # idempotent
    catalog.ensure_table(spark, "t_cat.stg", "a INT, b STRING")
    catalog.ensure_table(spark, "t_cat.stg", "a INT, b STRING")  # idempotent

    df = spark.range(5).select(F.col("id").cast("int").alias("a"),
                               F.lit("x").alias("b"))
    catalog.append_table(df, "t_cat.stg")
    assert catalog.read_table(spark, "t_cat.stg").count() == 5

    catalog.create_or_replace_as(spark, "t_cat.mart", df.where("a >= 3"))
    assert catalog.read_table(spark, "t_cat.mart").count() == 2
    # CTAS replaces
    catalog.create_or_replace_as(spark, "t_cat.mart", df.where("a < 3"))
    assert catalog.read_table(spark, "t_cat.mart").count() == 3

    catalog.truncate(spark, "t_cat.stg")
    assert catalog.read_table(spark, "t_cat.stg").count() == 0


def test_probe_latest_month_walks_backwards():
    served = {"2025-11", "2025-10"}
    calls = []

    def exists(url: str) -> bool:
        calls.append(url)
        return any(m in url for m in served)

    got = readers.probe_latest_month(
        "https://cdn/yellow_tripdata_{month}.parquet", 2026, 1, exists=exists
    )
    assert got == "2025-11"
    assert len(calls) == 3  # 2026-01, 2025-12, then hit

    assert (
        readers.probe_latest_month("x_{month}", 2026, 1, exists=lambda u: False, max_back=5)
        is None
    )


def test_csv_sink_reader_roundtrip(spark, tmp_path):
    from nyc_taxi_data_warehouse_spark.sources import sinks
    from pyspark.sql.types import StructType, StructField, IntegerType, StringType

    df = spark.createDataFrame(
        [(1, 'quoted,"text"'), (2, None), (3, "plain")], "id int, note string"
    )
    path = str(tmp_path / "export_csv")
    sinks.write_single_csv(df, path)

    schema = StructType(
        [StructField("id", IntegerType()), StructField("note", StringType())]
    )
    back = readers.read_csv_snowflake_format(spark, path, schema=schema)
    got = {r.id: r.note for r in back.collect()}
    # NULL_IF ('') semantics: empty → NULL, quotes preserved
    assert got == {1: 'quoted,"text"', 2: None, 3: "plain"}


def test_weather_rest_ingest_end_to_end(spark, tmp_path):
    """S11/S12: stubbed REST fetch → parsed row → append sink → read back
    with VARIANT-style JSON access over the preserved raw payload."""
    import json

    from nyc_taxi_data_warehouse_spark.functions.compat import json_get
    from nyc_taxi_data_warehouse_spark.sources import sinks

    payload = {
        "name": "New York",
        "main": {"temp": 41.5, "humidity": 63},
        "weather": [{"description": "light rain"}],
    }
    rows = readers.fetch_json_rows("stub://w", fetcher=lambda u: json.dumps(payload))
    parsed = [readers.weather_row_from_payload(p) for p in rows]
    assert parsed[0]["city"] == "New York" and parsed[0]["temp_f"] == 41.5

    df = spark.createDataFrame(
        parsed, "city string, temp_f double, humidity_pct int, weather_desc string, raw_json string"
    )
    path = str(tmp_path / "raw_weather")
    sinks.append(df, path)
    sinks.append(df, path)  # hourly cadence: two appends

    back = spark.read.parquet(path)
    assert back.count() == 2
    got = back.select(
        json_get("raw_json", "name").alias("n"),
        json_get("raw_json", "main.humidity").cast("int").alias("h"),
    ).collect()[0]
    assert got.n == "New York" and got.h == 63


def test_download_to_lake_end_to_end(spark, tmp_path):
    """S2+S3+S1 chain with a fake transport: probe finds the newest served
    month, the chunked download lands it in the lake (temp-file rename), and
    spark reads it back. Mirrors etl_spark_historical.py:113-178."""
    import io
    import os

    src = str(tmp_path / "served.parquet")
    spark.range(100).toDF("trip_id").coalesce(1).write.parquet(src)
    part = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    served_bytes = open(os.path.join(src, part), "rb").read()

    served = {"cdn/2025-11.parquet"}
    opened = []

    def opener(url):
        opened.append(url)
        assert url in served, f"download of unserved url {url}"
        return io.BytesIO(served_bytes)

    lake = str(tmp_path / "lake")
    df = readers.ingest_latest_month(
        spark,
        "cdn/{month}.parquet",
        2026,
        1,
        lake,
        exists=lambda u: u in served,
        opener=opener,
    )
    assert opened == ["cdn/2025-11.parquet"]          # probe walked 2026-01 -> 2025-11
    assert os.path.exists(os.path.join(lake, "2025-11.parquet"))
    assert df.count() == 100

    # no served month within the window -> None, nothing downloaded
    assert (
        readers.ingest_latest_month(
            spark, "cdn/{month}.parquet", 2026, 1, lake,
            exists=lambda u: False, opener=opener,
        )
        is None
    )


def test_download_failure_leaves_no_partial_file(tmp_path):
    import io
    import os

    import pytest

    class Exploding(io.RawIOBase):
        def __init__(self):
            self.calls = 0

        def read(self, n=-1):
            self.calls += 1
            if self.calls > 1:
                raise OSError("connection reset mid-stream")
            return b"x" * 10

    lake = str(tmp_path / "lake")
    with pytest.raises(OSError):
        readers.download_month_to_lake(
            "cdn/{month}.parquet", "2025-11", lake, opener=lambda u: Exploding()
        )
    assert os.listdir(lake) == []  # neither final nor .__part left behind
