"""Catalog / DDL operators (SURVEY §2.1 rows S9, S10, S16-S19).

Reference: Snowflake object provisioning and table-returning SQL issued from
Airflow tasks —
- idempotent `CREATE SCHEMA/TABLE IF NOT EXISTS`
  (`dags/etl_spark_historical.py:48-73,293-317`,
  `dags/weather_realtime_etl.py:46-66`, `dags/dbt_transformation_dag.py:26-46`)
- `CREATE OR REPLACE TABLE … AS SELECT` CTAS
  (`dags/weather_future_realtime.py:52-63`, `dags/zone_forecast.py:71-85`,
  `dags/Forecast_evaluation.py:108-112`)
- `TRUNCATE TABLE` staging reset (`dags/etl_spark_historical.py:382-384`)
- pandas `read_sql` / `to_sql` table IO (`dags/fare_model_training_dag.py:45`,
  `dags/weather_future_realtime.py:44-50`)

Spark-first: the session catalog (Hive-less, spark_catalog over the
configured warehouse dir) plays Snowflake's role; every helper is a thin,
idempotent wrapper over `spark.sql`/`saveAsTable` so the pipeline runner can
provision objects the way the reference's `ensure_objects` tasks do. All
writes are table-format-agnostic (parquet by default); at deployment scale
point the warehouse at object storage and swap in Delta via
`spark.sql.sources.default`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _q(ident: str) -> str:
    """Backtick-quote a (possibly dotted) identifier."""
    return ".".join(f"`{p}`" for p in ident.split("."))


def ensure_database(spark: SparkSession, name: str) -> None:
    """S10: `CREATE SCHEMA IF NOT EXISTS` — idempotent provisioning."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_q(name)}")


def ensure_table(spark: SparkSession, name: str, ddl_schema: str) -> None:
    """S10: `CREATE TABLE IF NOT EXISTS` with an explicit column schema
    (DDL-first, like the reference's fact/staging DDL)."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {_q(name)} ({ddl_schema})")


def create_or_replace_as(spark: SparkSession, name: str, df: DataFrame) -> None:
    """S18: CTAS — `CREATE OR REPLACE TABLE … AS SELECT`."""
    df.write.mode("overwrite").option("overwriteSchema", "true").saveAsTable(name)


def truncate(spark: SparkSession, name: str) -> None:
    """S9/S19: `TRUNCATE TABLE` (staging reset between merge batches)."""
    spark.sql(f"TRUNCATE TABLE {_q(name)}")


def append_table(df: DataFrame, name: str) -> None:
    """S17: `to_sql(if_exists='append')` equivalent."""
    df.write.mode("append").saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """S16: `read_sql` table scan equivalent."""
    return spark.table(name)
