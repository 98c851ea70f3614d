"""SCD Type 2 snapshot operators (SURVEY §2.10).

Reference: two dbt snapshots on Snowflake —
- timestamp strategy, key (city, observed_at), change when `load_ts`
  advances, `invalidate_hard_deletes=True`
  (`snapshots/snp_weather_observations.sql:13-44`);
- check strategy, key `trip_date`, change when any of 6 check_cols differ
  (`snapshots/snp_daily_metrics.sql:13-58`).

Emitted metadata matches the dbt column contract (`snapshots/schema.yml`):
`dbt_scd_id, dbt_updated_at, dbt_valid_from, dbt_valid_to`.

Design: storage-agnostic pure functions — (current snapshot, source batch) →
new snapshot DataFrame. The caller persists (Delta MERGE where available;
overwrite-partition Parquet otherwise). Timestamps are injectable (`as_of`)
so runs are deterministic and testable. Each application is a single
full-outer join on the key — one shuffle, no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.compat import surrogate_key

META = ("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")


def _stamp(source: DataFrame, key: Sequence[str], updated_at_col) -> DataFrame:
    """Attach dbt snapshot metadata to source rows becoming current."""
    return source.select(
        "*",
        surrogate_key(*key, updated_at_col).alias("dbt_scd_id"),
        updated_at_col.cast("timestamp").alias("dbt_updated_at"),
        updated_at_col.cast("timestamp").alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
    )


def _null_safe_change(check_cols: Sequence[str]) -> F.Column:
    """True when any check column differs (NULL-safe, dbt check strategy)."""
    cond = F.lit(False)
    for c in check_cols:
        cond = cond | ~F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}"))
    return cond


def snapshot_timestamp(
    current: DataFrame | None,
    source: DataFrame,
    key: Sequence[str],
    updated_at: str,
    as_of: datetime | None = None,
    invalidate_hard_deletes: bool = False,
) -> DataFrame:
    """dbt timestamp-strategy snapshot: a key's row is superseded when a
    source row arrives with a strictly newer `updated_at`."""
    stamped = _stamp(source, key, F.col(updated_at))
    if current is None:
        return stamped

    closed = current.where(F.col("dbt_valid_to").isNotNull())
    open_rows = current.where(F.col("dbt_valid_to").isNull())
    t, s = open_rows.alias("t"), source.alias("s")
    cond = None
    for k in key:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    changed = F.col(f"s.{updated_at}") > F.col("t.dbt_updated_at")
    src_present = F.col(f"s.{updated_at}").isNotNull()
    tgt_present = F.col("t.dbt_updated_at").isNotNull()

    # 1. open rows superseded by a newer source version → close them
    newly_closed = j.where(tgt_present & src_present & changed).select(
        *[F.col(f"t.{c}").alias(c) for c in open_rows.columns if c != "dbt_valid_to"],
        F.col(f"s.{updated_at}").cast("timestamp").alias("dbt_valid_to"),
    )

    # 2. open rows with no newer version → stay open
    kept = j.where(
        tgt_present & (~src_present | ~changed)
    ).select(*[F.col(f"t.{c}").alias(c) for c in open_rows.columns])

    # 3. hard deletes: open keys absent from source → close at as_of
    if invalidate_hard_deletes:
        as_of_lit = F.lit(as_of).cast("timestamp") if as_of else F.current_timestamp()
        gone = j.where(tgt_present & ~src_present).select(
            *[F.col(f"t.{c}").alias(c) for c in open_rows.columns if c != "dbt_valid_to"],
            as_of_lit.alias("dbt_valid_to"),
        )
        kept = j.where(tgt_present & src_present & ~changed).select(
            *[F.col(f"t.{c}").alias(c) for c in open_rows.columns]
        )
        kept = kept.unionByName(gone)

    # 4. new versions + brand-new keys → stamped source rows
    inserts_src = j.where(src_present & (~tgt_present | changed)).select(
        *[F.col(f"s.{c}").alias(c) for c in source.columns]
    )
    inserts = _stamp(inserts_src, key, F.col(updated_at))

    return closed.unionByName(newly_closed).unionByName(kept).unionByName(inserts)


def snapshot_check(
    current: DataFrame | None,
    source: DataFrame,
    key: Sequence[str],
    check_cols: Sequence[str],
    as_of: datetime,
) -> DataFrame:
    """dbt check-strategy snapshot: a key's row is superseded when any
    check column differs; version timestamps come from the run time."""
    as_of_col = F.lit(as_of).cast("timestamp")
    stamped = _stamp(source, key, as_of_col)
    if current is None:
        return stamped

    closed = current.where(F.col("dbt_valid_to").isNotNull())
    open_rows = current.where(F.col("dbt_valid_to").isNull())
    t, s = open_rows.alias("t"), source.alias("s")
    cond = None
    for k in key:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    src_present = F.lit(False)
    for c in source.columns:
        src_present = src_present | F.col(f"s.{c}").isNotNull()
    tgt_present = F.col("t.dbt_updated_at").isNotNull()
    changed = _null_safe_change(check_cols)

    newly_closed = j.where(tgt_present & src_present & changed).select(
        *[F.col(f"t.{c}").alias(c) for c in open_rows.columns if c != "dbt_valid_to"],
        as_of_col.alias("dbt_valid_to"),
    )
    kept = j.where(tgt_present & (~src_present | ~changed)).select(
        *[F.col(f"t.{c}").alias(c) for c in open_rows.columns]
    )
    inserts_src = j.where(src_present & (~tgt_present | changed)).select(
        *[F.col(f"s.{c}").alias(c) for c in source.columns]
    )
    inserts = _stamp(inserts_src, key, as_of_col)
    return closed.unionByName(newly_closed).unionByName(kept).unionByName(inserts)
