"""5-run-min re-measure for flagged bench movers (standing protocol,
BASELINE.md "Round-6 re-measure protocol"): N timed runs per query at
sf0.1 on local[32], cache clear + double GC between runs, host load
average recorded alongside.  The MIN is the contention-free signal.

Usage: python tools/remeasure.py [--runs=5] [--sf=/root/testdata/sf0.1] q ...
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("SPARK_GRAFT_CC_SPILL", "1")

import __spark_entry__ as entry_mod
from nyc_taxi_data_warehouse_spark.session import get_spark


def main() -> None:
    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)
    qs = entry_mod.queries()
    spark = get_spark("remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py: JVM/parquet footers + Python worker pool
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    from pyspark.sql.functions import col, pandas_udf

    __warm = pandas_udf(lambda s: s, "long")
    spark.range(256).repartition(32).select(__warm(col("id"))).count()
    out = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        out[name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
        print(f"{name}: samples={samples} min={min(samples)}", flush=True)
    print(json.dumps({"load_avg": os.getloadavg(), "sf_dir": sf_dir,
                      "runs": runs, "results": out}))


if __name__ == "__main__":
    main()
