"""Distribution-drift monitoring for corpus curation pipelines.

A training-data pipeline re-ingests feeds continuously; the question
"did source X's length/quality/score distribution shift?" has to be
answered BEFORE a drifted feed contaminates a training mix.  The
standard scorecard metric is the Population Stability Index:

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

over quantile bins of the REFERENCE distribution (rule of thumb:
< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

Scale shape: one boundary pass (`sampling.quantile_bounds` — integer
rank-threshold deciles, no global sort, no interpolation; the ≤ B−1
boundary values collect driver-side, scalar-sized) + ONE binning
pass: map-side bin assignment against the literal boundary array into
a single (group × bin) count aggregation, from which the reference
counts and group totals derive by re-aggregating the tiny counts frame
— the corpus lineage feeds exactly one aggregation → the PSI fold over
the dense group×bin grid (built from broadcast-sized frames, so missing
bins count as zeros instead of silently dropping out of the sum).  Laplace
smoothing ((c+1)/(n+B)) keeps empty bins finite and is replicated
digit-for-digit by the DuckDB oracle; the only float enters at the
final ln/multiply, rounded with the engine's epsilon-shift convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import bucketed_value_cumsum, quantile_bounds


def psi_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_bins: int = 10,
) -> DataFrame:
    """PSI of each group's ``value_col`` distribution against the WHOLE
    frame's distribution — the "which feed drifted?" dashboard.  Bins are
    the frame-wide quantile bins (type-1 integer boundaries), so every
    group is measured on the same ruler.  NULL values are excluded from
    both distributions.  Returns (group_col, n_rows, psi) with psi the
    raw double; callers round for cross-engine hashing.

    NOT lazy: calling this function runs one Spark job immediately (the
    scalar quantile-boundary collect — see :func:`_binned_grid`) and
    leaves a small (groups × bins) counts frame cached in the session;
    the cache entry lives until ``spark.catalog.clearCache()`` or
    session end (the harness clears between queries)."""
    return psi_from_grid(
        _binned_grid(df, group_col, value_col, num_bins), group_col
    )


def _binned_grid(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_bins: int,
) -> DataFrame:
    """The dense (group × quantile-bin) probability grid every binned
    divergence shares: (grp, n_g, p_g, p_r) with Laplace-smoothed
    fractions ((c+1)/(n+B)) so empty bins stay finite — one corpus
    aggregation, then (groups × bins)-sized arithmetic."""
    nn = df.where(F.col(value_col).isNotNull())
    # The B−1 boundaries are SCALAR-sized (≤ 9 values for deciles):
    # collect them and fold the bin assignment over a LITERAL array.
    # Leaving the boundary computation lazy in the serving plan
    # (crossJoin of the one-row bounds aggregate) replicated the whole
    # rank-threshold subtree — windows, offset joins, nested-loop
    # broadcasts — into every consumer's plan (round-6 verdict #2: 76
    # exchanges, 14 BNLJs); the eager scalar collect costs one boundary
    # job and leaves a scan → fold → single-aggregation serving plan.
    # Boundaries are bit-identical either way, so PSI values (and the
    # SQL oracle twin) are unchanged.
    bounds_row = quantile_bounds(nn, value_col, num_bins).collect()[0][0]
    x = F.col(value_col)
    if bounds_row:
        bin_expr = F.aggregate(
            F.array(*[F.lit(b) for b in bounds_row]),
            F.lit(1),
            lambda acc, b: acc + F.when(x > b, 1).otherwise(0),
        ).cast("int")
    else:
        bin_expr = F.lit(1)
    binned = nn.select(F.col(group_col).alias("grp"), bin_expr.alias("bin"))
    # ONE aggregation consumes the corpus-sized lineage; the reference
    # distribution and group totals re-aggregate the (groups × bins)
    # counts frame. per_g feeds three consumers, so persist the tiny
    # counts — or the scan + bin assignment lineage would replay per
    # consumer. No explicit unpersist (the result is lazy, so the cache
    # must outlive this function): the (groups × bins) entry stays in
    # the session CacheManager until catalog.clearCache / session end —
    # the terms.py/dedup.py convention; bench and the driver clearCache
    # between queries.
    per_g = (
        binned.groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c_g"))
        .persist()
    )
    return grid_from_counts(per_g, num_bins)


def grid_from_counts(per_g: DataFrame, num_bins: int) -> DataFrame:
    """The smoothed probability grid from an ALREADY-AGGREGATED
    (grp, bin, c_g) counts frame — shared by the batch path above and by
    streaming drift monitors, whose (window × bin) counts arrive from a
    drained streaming aggregation sink."""
    per_ref = per_g.groupBy("bin").agg(F.sum("c_g").alias("c_r"))
    n_g = per_g.groupBy("grp").agg(F.sum("c_g").alias("n_g"))
    n_tbl = per_ref.agg(F.sum("c_r").alias("n_all"))
    # dense grid: every (group, bin) cell, zeros included — all frames
    # here are (groups × bins)-sized, so the grid build is broadcast work
    bins = per_g.sparkSession.range(1, num_bins + 1).select(
        F.col("id").cast("int").alias("bin")
    )
    grid = (
        n_g.crossJoin(F.broadcast(bins))
        .join(per_g, ["grp", "bin"], "left")
        .join(F.broadcast(per_ref), "bin", "left")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "grp",
            "n_g",
            (
                (F.coalesce("c_g", F.lit(0)) + 1)
                / (F.col("n_g") + num_bins)
            ).alias("p_g"),
            (
                (F.coalesce("c_r", F.lit(0)) + 1)
                / (F.col("n_all") + num_bins)
            ).alias("p_r"),
        )
    )
    return grid


def psi_from_grid(grid: DataFrame, group_col: str) -> DataFrame:
    """The PSI fold over a probability grid — the shared tail of
    :func:`psi_by_group` and the streaming monitor."""
    term = (F.col("p_g") - F.col("p_r")) * F.log(F.col("p_g") / F.col("p_r"))
    return grid.groupBy("grp").agg(
        F.first("n_g").alias("n_rows"), F.sum(term).alias("psi")
    ).select(
        F.col("grp").alias(group_col),
        F.col("n_rows").cast("long").alias("n_rows"),
        "psi",
    )


def divergence_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_bins: int = 10,
) -> DataFrame:
    """The full binned-divergence scorecard over the shared
    :func:`_binned_grid`: PSI plus the three metrics a drift monitor
    usually reports alongside it —

    - ``kl_div``   KL(group ‖ reference) = Σ p_g·ln(p_g/p_r): the
      excess log-loss of modelling the group with the reference mix;
    - ``js_div``   Jensen–Shannon divergence (½KL(p_g‖m) + ½KL(p_r‖m),
      m the midpoint): symmetric, bounded by ln 2 — the metric to
      threshold when feeds of very different sizes are compared;
    - ``chi2``     n_g · Σ (p_g−p_r)²/p_r: the Pearson statistic on the
      smoothed fractions, comparable against χ²(B−1) critical values.

    Same Laplace smoothing and quantile ruler as :func:`psi_by_group`,
    so all four metrics agree on what a "bin" is; one corpus
    aggregation total.  Returns (group_col, n_rows, psi, kl_div,
    js_div, chi2) as raw doubles — callers round.

    NOT lazy: like :func:`psi_by_group`, construction runs the scalar
    quantile-boundary job eagerly and leaves the (groups × bins) counts
    frame cached until ``clearCache``/session end."""
    grid = _binned_grid(df, group_col, value_col, num_bins)
    p_g, p_r = F.col("p_g"), F.col("p_r")
    m = (p_g + p_r) / 2
    psi = (p_g - p_r) * F.log(p_g / p_r)
    kl = p_g * F.log(p_g / p_r)
    js = (p_g * F.log(p_g / m) + p_r * F.log(p_r / m)) / 2
    chi2 = (p_g - p_r) * (p_g - p_r) / p_r
    return grid.groupBy("grp").agg(
        F.first("n_g").alias("n_rows"),
        F.sum(psi).alias("psi"),
        F.sum(kl).alias("kl_div"),
        F.sum(js).alias("js_div"),
        (F.first("n_g") * F.sum(chi2)).alias("chi2"),
    ).select(
        F.col("grp").alias(group_col),
        F.col("n_rows").cast("long").alias("n_rows"),
        "psi",
        "kl_div",
        "js_div",
        "chi2",
    )


def ks_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic of each group's
    ``value_col`` distribution against the WHOLE frame's:
    D_g = sup_v |F_g(v) − F(v)| — the binning-free complement to the
    PSI scorecard (no ruler to choose, sensitive to any CDF gap).

    Scale shape: both CDFs come from :func:`.sampling.
    bucketed_value_cumsum` (distinct-value tables, value-bucketed
    parallel windows — never an unpartitioned sort).  The sup is
    attained at a step of either CDF, i.e. at one of the corpus's
    distinct values, so the group CDFs are evaluated on the global
    distinct-value axis: a (groups × V) grid where V is the DISTINCT
    value count — value-cardinality work, not corpus-sized (for a
    continuous column at 100 TB prefer the binned scorecard, where the
    ruler bounds the work).  Fill-forward of each group's step function
    across the axis runs within (group, value-bucket) windows plus a
    (groups × buckets) carry table — same parallelism argument as the
    cumsum itself.  The comparison |F_g·n − F·n_g| stays in exact
    integers; the single division by n_g·n happens once at the end, so
    the statistic is bit-reproducible against a SQL oracle.

    Returns (group_col, n_rows, ks) with ks the raw double.

    Cache ownership: the two CDF frames (value-cardinality-sized, not
    corpus-sized) are persisted here and NOT unpersisted — the result
    is lazy, so their lifetime must extend to the caller's final
    action; they stay in the session CacheManager until
    ``spark.catalog.clearCache()`` or session end (the harness clears
    between queries — long-lived sessions should clearCache
    themselves)."""
    nn = df.where(F.col(value_col).isNotNull())
    # Both CDF frames feed THREE consumers each (totals, carry/buckets,
    # grid join) — persist them or every reference replays the whole
    # scan → distinct → bucketed-window lineage and the plan carries
    # three copies of each subtree.  Both are value-cardinality-sized
    # (distinct values, not corpus rows); cached until harness
    # clearCache, the drift-module convention.
    gcum = bucketed_value_cumsum(nn, value_col, (group_col,)).select(
        F.col(group_col).alias("grp"), "__v", "__p", F.col("__cle").alias("__gle")
    ).persist()
    acum = bucketed_value_cumsum(nn, value_col).select(
        "__v", "__p", F.col("__cle").alias("__ale")
    ).persist()
    n_g = gcum.groupBy("grp").agg(F.max("__gle").alias("n_g"))
    n_tbl = acum.agg(F.max("__ale").alias("n_all"))
    groups = n_g.select("grp", "n_g")
    # carry-in per (group, bucket): the group's cumulative count at the
    # END of every earlier bucket — built over the FULL (groups ×
    # buckets) grid, because a bucket where the group has no values at
    # all still needs the carry from its last populated predecessor
    # (the left join alone would leave it NULL → a spurious CDF reset
    # to 0).  (groups × buckets)-sized throughout.
    buckets = acum.select("__p").distinct()
    bucket_last = gcum.groupBy("grp", "__p").agg(F.max("__gle").alias("__bl"))
    carry = (
        groups.select("grp")
        .crossJoin(F.broadcast(buckets))
        .join(bucket_last, ["grp", "__p"], "left")
        .select(
            "grp",
            "__p",
            F.coalesce(
                F.max("__bl").over(
                    Window.partitionBy("grp")
                    .orderBy("__p")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__carry"),
        )
    )
    grid = (
        acum.crossJoin(F.broadcast(groups))
        .join(gcum, ["grp", "__v", "__p"], "left")
        .join(F.broadcast(carry), ["grp", "__p"], "left")
    )
    wff = (
        Window.partitionBy("grp", "__p")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f_g = F.coalesce(
        F.last("__gle", ignorenulls=True).over(wff),
        F.col("__carry"),
        F.lit(0),
    )
    diff = grid.crossJoin(F.broadcast(n_tbl)).select(
        "grp",
        "n_g",
        "n_all",
        F.abs(
            f_g * F.col("n_all") - F.col("__ale") * F.col("n_g")
        ).alias("__d"),
    )
    return diff.groupBy("grp").agg(
        F.first("n_g").alias("__ng"),
        F.first("n_all").alias("__na"),
        F.max("__d").alias("__dmax"),
    ).select(
        F.col("grp").alias(group_col),
        F.col("__ng").cast("long").alias("n_rows"),
        (F.col("__dmax") / (F.col("__ng") * F.col("__na"))).alias("ks"),
    )
