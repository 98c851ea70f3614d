"""Exactly-once Iceberg streaming sink: replayed batches are skipped,
the watermark rides the same commit as the data, and a real
availableNow file stream drains through the sink end-to-end."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.sources import iceberg
from nyc_taxi_data_warehouse_spark.streaming import iceberg_sink


def test_replayed_batch_is_skipped(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sink = iceberg_sink.foreach_batch_iceberg_append(t, "q1")
    b0 = spark.range(10).select(F.col("id"))
    b1 = spark.range(10, 15).select(F.col("id"))
    sink(b0, 0)
    sink(b1, 1)
    assert iceberg.count_rows(t) == 15
    # at-least-once redelivery of batch 1 (and a stale batch 0)
    sink(b1, 1)
    sink(b0, 0)
    assert iceberg.count_rows(t) == 15
    assert iceberg_sink.last_committed_batch(t, "q1") == 1
    # the next NEW batch still lands
    sink(spark.range(15, 18).select(F.col("id")), 2)
    assert iceberg.count_rows(t) == 18


def test_two_queries_namespaced(spark, tmp_path):
    t = str(tmp_path / "tbl")
    a = iceberg_sink.foreach_batch_iceberg_append(t, "qa")
    b = iceberg_sink.foreach_batch_iceberg_append(t, "qb")
    a(spark.range(5).select(F.col("id")), 0)
    b(spark.range(5, 9).select(F.col("id")), 0)  # same batch id, other query
    assert iceberg.count_rows(t) == 9
    assert iceberg_sink.last_committed_batch(t, "qa") == 0
    assert iceberg_sink.last_committed_batch(t, "qb") == 0


def test_available_now_stream_drains_into_iceberg(spark, tmp_path):
    feed = str(tmp_path / "feed")
    t = str(tmp_path / "tbl")
    src = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))
    src.write.parquet(feed)
    stream = spark.readStream.schema("id bigint, k bigint").parquet(feed)
    q = (
        stream.writeStream.foreachBatch(
            iceberg_sink.foreach_batch_iceberg_append(t, "drain")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drained = q.awaitTermination(120)
    q.stop()
    if not drained:
        pytest.fail("availableNow drain timed out")
    back = iceberg.read_iceberg(spark, t)
    assert back.count() == 100
    assert iceberg.count_rows(t) == 100
    assert iceberg_sink.last_committed_batch(t, "drain") >= 0
