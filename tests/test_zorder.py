"""Z-order clustering tests: Morton interleave correctness against a
driver-side reference, and the file-skipping property — a z-ordered
layout bounds per-file spans on BOTH columns where a single-column sort
leaves the other column full-range in every file."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators import zorder


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z += ((x >> b) & 1) << (2 * b)
        z += ((y >> b) & 1) << (2 * b + 1)
    return z


def _grid_df(spark, n=128):
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            # scatter row order so neither layout is accidental
            F.md5(F.col("id").cast("string")).alias("salt"),
        )
        .orderBy("salt")
        .drop("salt")
    )


def test_zvalue_matches_reference_morton(spark):
    # 0..255 bounds make the grid normalization the identity map
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(64)]
    df = spark.createDataFrame(rows + [(999, 0, 0), (1000, 255, 255)],
                               ["id", "x", "y"])
    got = {r["id"]: r["z"] for r in zorder.with_zvalue(df, "x", "y").collect()}
    for i, x, y in rows:
        assert got[i] == _morton(x, y)
    assert got[1000] == _morton(255, 255)


def test_fractional_columns_spread_across_grid(spark):
    """Review regression: lat/lon-style doubles must yield many distinct
    z-values, not collapse to one cell via premature long truncation."""
    n = 200
    rows = [
        (i, 40.5 + 0.2 * (i % 20) / 20.0, -74.0 + 0.4 * (i // 20) / 10.0)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["id", "lat", "lon"])
    zs = zorder.with_zvalue(df, "lat", "lon")
    distinct = zs.select("z").distinct().count()
    assert distinct > n // 4  # many cells, not 1


def _file_spans(spark, path, col):
    spans = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        r = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        if r["lo"] is not None:
            spans.append((int(r["lo"]), int(r["hi"])))
    return spans


def test_zordered_write_bounds_both_columns(spark, tmp_path):
    df = _grid_df(spark, n=128).persist()
    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    zorder.write_zordered(df, zpath, "x", "y", n_files=16)
    df.repartitionByRange(16, "x").write.mode("overwrite").parquet(xpath)

    def avg_matching_files(spans, domain=128):
        # expected fraction of files a random point predicate must read
        return sum(hi - lo + 1 for lo, hi in spans) / domain / len(spans)

    zx = avg_matching_files(_file_spans(spark, zpath, "x"))
    zy = avg_matching_files(_file_spans(spark, zpath, "y"))
    sx = avg_matching_files(_file_spans(spark, xpath, "x"))
    sy = avg_matching_files(_file_spans(spark, xpath, "y"))
    df.unpersist()
    # x-sorted: near-perfect on x, useless on y (every file full-range)
    assert sy > 0.9
    # z-ordered: BOTH columns prune to well under half the files
    assert zx < 0.5 and zy < 0.5
    # and y-pruning beats the single-column layout by a wide margin
    assert zy < sy / 2
    # single-column layout stays better on its own sort key, of course
    assert sx <= zx
