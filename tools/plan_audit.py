"""Physical-plan audit over every registered query.

For each `queries()` entry, prints the join strategies, exchange count, scan
pushdown summary, and flags the anti-patterns that matter at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin where an equi-join was expected
- a parquet scan with no pushed filters AND full-width ReadSchema feeding a
  narrow projection (pruning failure)
- row-at-a-time PythonUDF in the plan (ArrowEvalPython / mapInPandas are the
  sanctioned Python crossings)

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from nyc_taxi_data_warehouse_spark.session import get_spark

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BatchEvalPython" in plan:  # row-at-a-time Python UDF
        flags.append("ROW_PYTHON_UDF")
    # scans reading every column with no pushdown
    for scan in re.finditer(r"PushedFilters: \[\]\nReadSchema: struct<([^>]*)>", plan):
        if scan.group(1).count(",") >= 8:
            flags.append("WIDE_UNPUSHED_SCAN")
            break
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    n_flagged = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            n_flagged += 1
            continue
        joins = {k: plan.count(k + " ") + plan.count(k + "\n") for k in JOIN_KINDS}
        joins = {k: v for k, v in joins.items() if v}
        flags = audit(name, plan)
        n_flagged += bool(flags)
        print(
            f"{name}: exchanges={plan.count('Exchange')} "
            f"joins={joins or '{}'} "
            f"pushed_scans={len(re.findall(r'PushedFilters: .?[^]]', plan))} "
            + (f"FLAGS={flags}" if flags else "ok")
        )
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
