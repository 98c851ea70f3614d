"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column-name sets,
and an order-insensitive value multiset. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from nyc_taxi_data_warehouse_spark.plans.nyc_views import TABLES
from nyc_taxi_data_warehouse_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(s_rows)} rows, no oracle)")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
        if cs != cd:
            bad = next(
                (i for i, (a, b) in enumerate(zip(cs, cd)) if a != b), None
            )
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark: {cs[bad] if bad is not None else '?'}")
            print(f"  duck : {cd[bad] if bad is not None else '?'}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(s_rows)} rows, {dt:.1f}s")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
