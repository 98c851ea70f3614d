"""Z-order (Morton-curve) data clustering for lake writes.

At 100 TB, file-skipping is the first line of defense: parquet
readers prune files whose column min/max stats exclude the predicate.
Sorting by ONE column makes every file full-range on every OTHER
column, so only single-column predicates skip. Interleaving the bits
of two (or more) rank-bucketed columns into a Morton z-value and
range-partitioning on it gives every file a bounded min/max RECTANGLE
in the multi-column space — predicates on any clustered column skip
(the technique behind Delta/Databricks OPTIMIZE ZORDER BY).

All integer math: values normalize to a 2^bits grid via
``(x - min) * 2^bits // (range + 1)`` (non-negative, so truncation ==
floor in every engine) and the interleave is an unrolled shift/mask
sum — deterministic, SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # per-column grid bits; z-value uses 2*BITS


def grid_expr(col: Column | str, lo: Column, hi: Column, bits: int = BITS) -> Column:
    """Normalize a value to the [0, 2^bits) integer grid given inclusive
    bounds. All arithmetic in DOUBLE — scaling happens BEFORE any
    truncation, so fractional columns (lat/lon-style doubles) spread
    across the grid instead of collapsing to one cell (review
    regression: an early cast-to-long of (x - lo) floored every
    sub-unit difference to 0). (x-lo)*2^bits/(hi-lo+1) is < 2^bits for
    x ≤ hi and non-negative; for integer columns the result is
    bit-identical to the SQL twin (exact double subtraction/division at
    these magnitudes). The +1 in the denominator keeps hi in-range
    without a clamp; for fractional domains narrower than 1.0 it costs
    grid resolution (range/(range+1) of the cells) but stays monotone —
    acceptable for clustering, not for equality bucketing."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    return F.floor(
        (c - lo.cast("double")) * F.lit(1 << bits)
        / (hi.cast("double") - lo.cast("double") + 1)
    ).cast("long")


def interleave_expr(xg: Column, yg: Column, bits: int = BITS) -> Column:
    """Morton interleave of two grid coordinates: bit b of x lands at
    2b, bit b of y at 2b+1. Unrolled shift/mask sum (JVM-side integer
    ops, no UDF)."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xg, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(yg, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def with_zvalue(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = BITS,
    z_col: str = "z",
) -> DataFrame:
    """Append the Morton z-value of (x_col, y_col). Column bounds come
    from a 1-row broadcast-aggregate crossJoin (the repo's corpus-stats
    shape) — one extra aggregation, no collect, no second scan action."""
    bounds = df.agg(
        F.min(x_col).alias("__xlo"),
        F.max(x_col).alias("__xhi"),
        F.min(y_col).alias("__ylo"),
        F.max(y_col).alias("__yhi"),
    )
    z = interleave_expr(
        grid_expr(x_col, F.col("__xlo"), F.col("__xhi"), bits),
        grid_expr(y_col, F.col("__ylo"), F.col("__yhi"), bits),
        bits,
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(z_col, z)
        .drop("__xlo", "__xhi", "__ylo", "__yhi")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = BITS,
) -> None:
    """Write parquet clustered on the (x_col, y_col) z-curve: range-
    partition on the z-value (contiguous curve segments per file, so
    each file covers a bounded rectangle) and sort within partitions so
    row groups cluster too. The z column is dropped before writing."""
    zdf = with_zvalue(df, x_col, y_col, bits, z_col="__z")
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def interval_overlap_depth(
    files: DataFrame, lo: str = "min_ck", hi: str = "max_ck"
) -> DataFrame:
    """Per-file clustering depth: for every row of ``files`` (a file- or
    partition-grain frame carrying a clustering key's ``[lo, hi]``
    min/max range), count how many rows' ranges overlap it — SELF
    INCLUDED, so a fully disjoint layout has depth 1 everywhere and a
    full-domain-span layout has depth = #files.  This is the metric
    OPTIMIZE ZORDER is judged by.

    The join is intentionally a bounded range self-join: ``files`` is
    METADATA (one row per file/partition), never the corpus — callers
    aggregate the corpus down to the grain first, so the quadratic is
    capped by the file count, not the row count.  All other columns of
    ``files`` pass through unchanged (they join the groupBy key)."""
    a, b = files.alias("a"), files.alias("b")
    keys = [F.col(f"a.{c}").alias(c) for c in files.columns]
    return (
        a.join(
            b,
            (F.col(f"a.{lo}") <= F.col(f"b.{hi}"))
            & (F.col(f"b.{lo}") <= F.col(f"a.{hi}")),
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("depth"))
    )
