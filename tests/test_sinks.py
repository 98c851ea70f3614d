"""Lake-layout tests: date-partitioned writes actually partition-prune."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.plans import nyc_views
from nyc_taxi_data_warehouse_spark.sources import sinks


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    trips = nyc_views.trips_from_events(
        nyc_views.load_tables(spark, sf_dir)["events"]
    ).na.drop(subset=["pickup_datetime"])
    path = str(tmp_path / "fact_trips")
    sinks.write_partitioned_by_date(trips, path, "pickup_datetime")

    back = spark.read.parquet(path)
    n_dates = back.select("p_date").distinct().count()
    assert n_dates > 1  # layout actually split by date

    one_day = back.select(F.min("p_date")).collect()[0][0]
    pruned = back.where(F.col("p_date") == one_day)
    # the date predicate lands in PartitionFilters (directory pruning), NOT
    # as a data filter over all files
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and str(one_day) in pf[0]
    assert pruned.count() == back.where(F.col("p_date") == one_day).count() > 0

    # roundtrip preserves rows
    assert back.count() == trips.count()
