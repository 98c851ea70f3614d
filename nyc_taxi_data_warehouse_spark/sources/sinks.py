"""Sinks (SURVEY §2.1) — the 100 TB-aware replacements for the reference's
CSV-détour + Snowflake stage pipeline.

The reference writes `coalesce(1)` single-file CSV then PUT/COPYs it into
Snowflake (`dags/etl_spark_historical.py:199-207,319-347`) — an anti-scale
choice called out in SURVEY §4. The engine's native path is date-partitioned
parquet: partition pruning makes every time-ranged query skip irrelevant
files, and writers parallelize per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
    date_col: str = "p_date",
) -> None:
    """Lake-table write partitioned by event date — the engine's fact-table
    layout. At 100 TB this yields ~1 partition/day/shuffle-task; combine with
    AQE coalescing to avoid small files."""
    (
        df.withColumn(date_col, F.to_date(ts_col))
        .write.mode(mode)
        .partitionBy(date_col)
        .parquet(path)
    )


def overwrite_date_partitions(
    df: DataFrame,
    path: str,
    ts_col: str,
    date_col: str = "p_date",
) -> None:
    """Incremental mart refresh (the reference lists 'incremental models' as
    future work — `README.md:375`): dynamic partition overwrite replaces
    ONLY the date partitions present in `df`, leaving every other partition
    untouched. This is how a daily transform reprocesses late-arriving days
    at 100 TB without rewriting the table."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn(date_col, F.to_date(ts_col))
            .write.mode("overwrite")
            .partitionBy(date_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_single_csv(df: DataFrame, path: str) -> None:
    """Reference-compat single-file CSV sink (S4,
    `dags/etl_spark_historical.py:199-207`). Kept only for parity/export of
    small results — scale path is :func:`write_partitioned_by_date`."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        # quote-doubling escape, matching the stage file format the reference
        # COPYs with (S5: FIELD_OPTIONALLY_ENCLOSED_BY='"') and our reader
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def append(df: DataFrame, path: str) -> None:
    """Append-mode event sink (weather feed, S12)."""
    df.write.mode("append").parquet(path)


def compact(spark, path: str, target_files: int) -> int:
    """Small-files compaction: rewrite a table directory down to
    `target_files` files (hourly appends leave one tiny file per batch; at
    scale the metadata and open-cost of millions of small files dominates
    scan time). Write-to-temp + swap keeps readers from seeing a partial
    rewrite. Returns the resulting file count."""
    import shutil

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp"
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return len([f for f in spark.read.parquet(path).inputFiles()])


def read_with_schema_evolution(spark, path: str) -> DataFrame:
    """Union-schema read across files written at different schema versions
    (`mergeSchema`): late-added columns surface as NULL for old files —
    the append-only lake's answer to ALTER TABLE ADD COLUMN."""
    return spark.read.option("mergeSchema", "true").parquet(path)
