"""Scale probe for the TPC-H analog family: run the real registry
queries at 1x/4x/8x FACT growth and report wall-time ratios.

Unlike tools/scale_probe.py (which grows an in-memory frame), the TPC-H
analogs read every table through ``load_tables(sf_dir)``, so this probe
materializes grown sf directories: lineitem and orders are replicated
with REP-SHIFTED order keys (join consistency preserved — each replica
is a disjoint order population against the SAME fixed dimensions, which
is how a warehouse actually grows) and rep-shifted dates/quantities so
the grown facts add content, not just duplicate rows.  Dimension tables
(and the non-TPC-H tables load_tables needs) are copied as-is.

Usage:  python tools/tpch_scale_probe.py [sf_dir] [query ...]
        (default sf_dir /root/testdata/sf0.1; default queries: the
        bench representatives q_tpch_q1 q_tpch_q5 q_tpch_q13
        q_tpch_q18 q_tpch_q21)
Prints one JSON line: {"query": {"1": s, "4": s, "8": s, "growth_8x": r}}

Probe dirs are written under <repo>/.probe_data/ (gitignored) and
reused across runs.  Run on an idle host.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.session import get_spark

DEFAULT_QUERIES = [
    "q_tpch_q1",   # wide-aggregate scan, no join
    "q_tpch_q5",   # 6-table star: fact-fact shuffle + broadcast dims
    "q_tpch_q13",  # LEFT OUTER fact join + two-level histogram agg
    "q_tpch_q18",  # IN-subquery with HAVING over a fact aggregation
    "q_tpch_q21",  # decorrelated EXISTS/NOT-EXISTS, fact-fact double-consume
]

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "events", "documents", "embeddings",
]


def _grow_dir(spark, sf_dir: str, mult: int) -> str:
    """Materialize the mult× directory (reused if already written)."""
    if mult == 1:
        return sf_dir
    out = os.path.join(REPO, ".probe_data", f"m{mult}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        o.select(rep, *o.columns)
        .select(
            (F.col("o_orderkey") * mult + F.col("rep")).alias("o_orderkey"),
            *[c for c in o.columns if c not in ("o_orderkey", "o_orderdate")],
            F.timestamp_add("DAY", F.col("rep"), F.col("o_orderdate")).alias(
                "o_orderdate"
            ),
        )
        .coalesce(8)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        li.select(rep, *li.columns)
        .select(
            (F.col("l_orderkey") * mult + F.col("rep")).alias("l_orderkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_shipdate")],
            F.timestamp_add("DAY", F.col("rep"), F.col("l_shipdate")).alias(
                "l_shipdate"
            ),
        )
        .coalesce(16)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    open(marker, "w").close()
    return out


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn().write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("tpch_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries {unknown}")

    dirs = {m: _grow_dir(spark, sf_dir, m) for m in (1, 4, 8)}
    report: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        # throwaway 1x run: JIT/codegen/footer-cache warmup is not plan cost
        _time(lambda: fn(spark, dirs[1]))
        spark.catalog.clearCache()
        times: dict[str, float] = {}
        for m in (1, 4, 8):
            times[str(m)] = _time(lambda: fn(spark, dirs[m]))
            spark.catalog.clearCache()
        times["growth_8x"] = round(times["8"] / times["1"], 2)
        report[name] = times
    print(json.dumps(report))


if __name__ == "__main__":
    main()
