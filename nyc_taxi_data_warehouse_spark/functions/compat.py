"""Snowflake-semantics expression layer (SURVEY.md §2.5).

The reference's dbt models run on Snowflake, whose datetime functions differ
from Spark's in exactly three places; this module pins those semantics so the
Spark plans reproduce the reference bit-for-bit:

- ``datediff_minute`` — Snowflake ``DATEDIFF('minute', a, b)`` counts
  *minute-boundary crossings*, not elapsed-time rounding
  (reference use: ``models/intermediate/int_trips_enriched.sql:24``).
- ``dayofweek0`` — Snowflake numbers Sunday=0..Saturday=6; Spark
  ``dayofweek`` numbers Sunday=1..Saturday=7
  (reference use: ``int_trips_enriched.sql:34-36``).
- ``dayname3`` — Snowflake ``DAYNAME`` returns 3-letter 'Mon'/'Tue'
  (reference use: ``int_trips_enriched.sql:35``).
- ``surrogate_key`` — dbt_utils ``generate_surrogate_key`` semantics:
  md5 of '-'-joined coalesce(cast(col as string), '')
  (reference use: ``snapshots/snp_weather_observations.sql:38``).

All are pure Column expressions — they stay inside whole-stage codegen; no
Python UDFs anywhere in this layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def minute_bucket(ts: Column | str) -> Column:
    """Epoch-minute index of a timestamp (floor of epoch-seconds / 60)."""
    return F.floor(F.unix_timestamp(_col(ts)) / F.lit(60))


def datediff_minute(start: Column | str, end: Column | str) -> Column:
    """Snowflake DATEDIFF('minute', start, end): minute boundaries crossed.

    NOT round((end-start)/60): 10:00:59 → 10:01:01 is 1 minute here.
    """
    return (minute_bucket(end) - minute_bucket(start)).cast("long")


def dayofweek0(ts: Column | str) -> Column:
    """Snowflake DAYOFWEEK: Sunday=0 .. Saturday=6 (Spark is 1..7)."""
    return (F.dayofweek(_col(ts)) - F.lit(1)).cast("int")


def dayname3(ts: Column | str) -> Column:
    """Snowflake DAYNAME: 3-letter English day abbreviation ('Mon')."""
    return F.date_format(_col(ts), "EEE")


def is_weekend(ts: Column | str) -> Column:
    """Snowflake `dayofweek in (0, 6)` == Sunday or Saturday."""
    return F.dayofweek(_col(ts)).isin(1, 7)


def surrogate_key(*cols: Column | str) -> Column:
    """dbt_utils.generate_surrogate_key: md5 of '-'-joined string casts,
    NULL → '' (dbt_utils 1.1.1; reference packages.yml:1-3)."""
    parts = [F.coalesce(_col(c).cast("string"), F.lit("")) for c in cols]
    return F.md5(F.concat_ws("-", *parts))


def guarded_speed_mph(distance: Column | str, duration_min: Column | str) -> Column:
    """`int_trips_enriched.sql:25-29`: distance/(minutes/60), 0 when min<=0."""
    d, m = _col(distance), _col(duration_min)
    return F.when(m > 0, d / (m / F.lit(60.0))).otherwise(F.lit(0.0)).cast("double")


def json_get(raw: Column | str, field: str) -> Column:
    """VARIANT-style field access over a raw-JSON string column (E13)."""
    return F.get_json_object(_col(raw), f"$.{field}")
