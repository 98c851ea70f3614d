"""Per-query isolation timer (optimization guide §1): runs the named
queries through the noop sink K times on an otherwise-idle session,
reporting per-run wall seconds plus the Spark job/stage counts each run
issued (statusTracker deltas) — the job count is the action/collect
audit, the stage count tracks exchanges.

Usage:
    python tools/qtime.py [sf_dir] q_name [q_name ...]
    SPARK_GRAFT_QTIME_RUNS=5 python tools/qtime.py ...
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from nyc_taxi_data_warehouse_spark.session import get_spark

RUNS = int(os.environ.get("SPARK_GRAFT_QTIME_RUNS", "3"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].startswith("q_"):
        sf_dir = args.pop(0)
    os.environ.setdefault("SPARK_GRAFT_CC_SPILL", "1")
    qs = entry_mod.queries()
    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warmup as bench.py: parquet footer cache, Python worker pool
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    from pyspark.sql.functions import col, pandas_udf

    __warm = pandas_udf(lambda s: s, "long")
    spark.range(256).repartition(32).select(__warm(col("id"))).count()

    tracker = sc.statusTracker()
    for name in args:
        fn = qs[name]
        samples = []
        for i in range(RUNS):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobGroup(f"qtime_{name}_{i}", name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            jobs = tracker.getJobIdsForGroup(f"qtime_{name}_{i}") or []
            nstages = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is not None:
                    nstages += len(ji.stageIds)
            samples.append((dt, len(jobs), nstages))
            spark.catalog.clearCache()
            gc.collect()
            sc._jvm.System.gc()
        ts = sorted(s[0] for s in samples)
        med = ts[len(ts) // 2] if RUNS % 2 else ts[len(ts) // 2 - 1]
        print(
            f"{name}: min={ts[0]:.2f} med={med:.2f} "
            f"runs={[f'{t:.2f}' for t, _, _ in samples]} "
            f"jobs={[j for _, j, _ in samples]} "
            f"stages={[s for _, _, s in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
