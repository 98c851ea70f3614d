"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference warehouse (aakashvardhan/nyc-taxi-data-warehouse).

The reference is an Airflow + Snowflake + dbt + pandas/sklearn ELT pipeline;
this package re-expresses its entire operator surface (SURVEY.md §2) as an
idiomatic Spark DataFrame engine:

- ``session``      — SparkSession factory (UTC, AQE, tuned shuffle).
- ``functions``    — Snowflake-compat expression layer, text/vector helpers.
- ``sources``      — readers (parquet/csv/json), sinks (partitioned parquet).
- ``plans``        — the dbt model DAG (staging → intermediate → marts →
                     features) as lazily-composed DataFrame functions.
- ``operators``    — merge/dedup-upsert, SCD2 snapshots, data-quality runner,
                     large-scale dedup (minhash-LSH/simhash), similarity search.
- ``streaming``    — Structured Streaming re-expression of the hourly feeds.
- ``ml``           — the fare-forecasting chain (RF train/predict/hindcast).
"""

__version__ = "0.1.0"
