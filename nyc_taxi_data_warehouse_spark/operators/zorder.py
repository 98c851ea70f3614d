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


def hilbert_expr(xg: Column, yg: Column, bits: int = BITS) -> Column:
    """Hilbert-curve distance of a (xg, yg) grid cell — the
    locality-superior alternative to :func:`interleave_expr`'s Morton
    order (the Hilbert curve never jumps across the space, so
    consecutive curve cells are always spatially adjacent; Morton has
    2^b-length discontinuities at quadrant seams).  xy2d (the classic
    quadrant-rotation recurrence) as a RUNTIME `F.aggregate` fold over
    the level sizes with a (x, y, d) struct accumulator — an unrolled
    column chain would double the expression tree per level (the
    rotation reads both coordinates twice → 4^bits nodes, which stalls
    analysis; measured round 13), while the fold keeps ONE linear
    expression evaluated per row.  Grid coords are small non-negative
    ints, so ``(v / s) cast long`` is an exact floor division and the
    whole recurrence stays on the integer lattice — bit-identical to
    the SQL twin from :func:`hilbert_sql_exprs`."""
    n = 1 << bits
    levels = F.array(*[F.lit(1 << lvl).cast("long") for lvl in range(bits - 1, -1, -1)])

    def step(acc: Column, s: Column) -> Column:
        # canonical rot(): reflection is against the FULL grid (n-1), so
        # coordinates stay in [0, n) and the bit tests never see negatives
        rx = (acc["x"] / s).cast("long") % 2
        ry = (acc["y"] / s).cast("long") % 2
        d = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        nx = (
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(n - 1) - acc["y"]).otherwise(acc["y"]),
            )
            .otherwise(acc["x"])
            .cast("long")
        )
        ny = (
            F.when(
                ry == 0,
                F.when(rx == 1, F.lit(n - 1) - acc["x"]).otherwise(acc["x"]),
            )
            .otherwise(acc["y"])
            .cast("long")
        )
        return F.struct(nx.alias("x"), ny.alias("y"), d.cast("long").alias("d"))

    acc = F.aggregate(
        levels,
        F.struct(
            xg.cast("long").alias("x"),
            yg.cast("long").alias("y"),
            F.lit(0).cast("long").alias("d"),
        ),
        step,
    )
    return acc["d"]


def hilbert_sql_exprs(bits: int = BITS) -> str:
    """DuckDB twin of :func:`hilbert_expr` as a chain of per-level CTE
    selects over columns (x, y, d) — call with a CTE named ``g0``
    providing (x, y) grid coordinates plus carried-through columns named
    in ``carry``; returns the ``h1..h{bits}`` CTE chain text whose final
    CTE ``h{bits}`` has the Hilbert distance in ``d``."""
    parts = []
    prev = "g0"
    n = 1 << bits
    for i, lvl in enumerate(range(bits - 1, -1, -1), start=1):
        s = 1 << lvl
        # integer-division bit test ((x // s) % 2) mirrors the engine's
        # fold; reflection against n-1 keeps coordinates non-negative
        parts.append(f""",
h{i} AS MATERIALIZED (
    SELECT * REPLACE (
        d + {s * s} * xor(((x // {s}) % 2) * 3, (y // {s}) % 2) AS d,
        CASE WHEN ((y // {s}) % 2) = 0
             THEN CASE WHEN ((x // {s}) % 2) = 1 THEN {n - 1} - y ELSE y END
             ELSE x END AS x,
        CASE WHEN ((y // {s}) % 2) = 0
             THEN CASE WHEN ((x // {s}) % 2) = 1 THEN {n - 1} - x ELSE x END
             ELSE y END AS y
    )
    FROM {prev}
)""")
        prev = f"h{i}"
    return "".join(parts)
