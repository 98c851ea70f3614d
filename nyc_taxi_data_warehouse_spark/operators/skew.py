"""Skew-mitigation helpers for hot-key joins and aggregations.

First line of defense is AQE's skew-join splitting (on in `session.py`),
which re-plans from runtime partition statistics. These helpers cover the
cases AQE can't fix:

- `salted_agg`: a two-phase aggregation for algebraic aggregates when ONE
  grouping key dominates (e.g. one zone id holds 30% of all trips). Phase 1
  aggregates on (key, salt) — spreading the hot key over `n_salts`
  reducers — phase 2 re-aggregates the per-salt partials. Spark's partial
  (map-side) aggregation already handles most skew; salting matters when
  per-partition cardinality is so high the partial-agg hash map degrades.
- `salted_broadcast_join`: replicate-the-small-side join for a skewed fact
  key against a dimension too big to broadcast whole but small enough to
  broadcast `n_salts` replicas of the hot keys' rows. The fact side gets a
  random salt; the dim side is exploded over all salts.

Both preserve exact semantics — salts never leak into results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    *,
    counts: Sequence[str] = (),
    sums: Sequence[str] = (),
) -> DataFrame:
    """Two-phase count/sum aggregation over `keys` with a salt fan-out.

    Returns one row per key with `row_count`, a non-null `<c>_count` per
    `counts` column, and a `<c>_sum` per `sums` column. Averages derive
    downstream as sum/count (algebraic decomposition); non-algebraic
    aggregates (median, mode) need different machinery and are out of scope.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    cols = dict.fromkeys([*counts, *sums])  # de-dup, keep order
    phase1 = df.select(*keys, salt, *cols).groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(c).alias(f"__cnt_{c}") for c in counts],
        *[F.sum(c).alias(f"__sum_{c}") for c in sums],
    )
    aggs = [F.sum("__n").alias("row_count")]
    aggs += [F.sum(f"__cnt_{c}").alias(f"{c}_count") for c in counts]
    aggs += [F.sum(f"__sum_{c}").alias(f"{c}_sum") for c in sums]
    return phase1.groupBy(*keys).agg(*aggs)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Skew-safe equi-join: fact rows draw a random salt, dim rows replicate
    across every salt, and the join runs on (key, salt) so a hot key spreads
    over `n_salts` tasks instead of one straggler."""
    f = fact.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(d, on=[key, "__salt"], how=how)
    return out.drop("__salt")
