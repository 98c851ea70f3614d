"""Adversarial-skew probe for the LSH dedup path (VERDICT r12 item 4).

The hot-bucket cap (`operators/dedup.DEFAULT_MAX_BUCKET`) is the one
load-bearing scale guard in the near-dup pipeline: without it, one
boilerplate template shared by p% of the corpus turns band buckets into
O((p·N)²) pair bombs.  This probe makes that flood real — 20% of docs
share one long template (tiny unique tail, so signatures collide in
every band) — and measures, at 1×/8×/32× corpus scale:

- wall time of the capped candidate generation (`lsh_candidate_pairs`),
- the planted-twin RECALL among NON-flood docs (each doc_id % 7 == 1
  gets a suffix twin; a sane cap must not lose these), and
- what the cap dropped (`lsh_hot_buckets`: bucket count, max occupancy,
  member rows) — the observable, auditable cost of the guard.

If the cap works, time grows ~linearly, non-flood recall stays ~1.0,
and the drop report contains exactly the flood's buckets.  Run idle.

Usage: python tools/lsh_skew_probe.py [sf_dir] [mult ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators import dedup
from nyc_taxi_data_warehouse_spark.plans.nyc_views import load_tables
from nyc_taxi_data_warehouse_spark.session import get_spark

_NH = 8
_BOILER = " ".join(f"boiler{i} lorem ipsum dolor" for i in range(40))


def _flood_docs(spark, sf_dir: str, mult: int):
    """mult× suffix-shifted corpus with (a) 20% of docs replaced by the
    shared boilerplate template + a short unique tail, and (b) a planted
    suffix twin for every non-flood doc_id % 7 == 1."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    if mult > 1:
        d = d.select(
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep"),
            "doc_id",
            "text",
        ).select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
            F.expr("substring(text, rep * 7 + 1)").alias("text"),
        )
    base = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(_BOILER + " tail"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # twins only on docs long enough that BOTH sides clear the 3-token
    # shingle floor (suffix-shifted replicas shrink with rep; a twin of
    # a too-short doc has a NULL signature and measures nothing)
    twins = base.where(
        (F.col("doc_id") % 5 != 0)
        & (F.col("doc_id") % 7 == 1)
        & (F.length("text") >= 300)
    ).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.expr("substring(text, 25)").alias("text"),
    )
    out = base.unionByName(twins)
    return out.repartition(spark.sparkContext.defaultParallelism)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(a) for a in sys.argv[2:]] or [1, 8, 32]
    spark = get_spark("lsh_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "boiler_share": 0.2, "cap": dedup.DEFAULT_MAX_BUCKET}
    for m in mults:
        docs = _flood_docs(spark, sf_dir, m).persist()
        n_docs = docs.count()
        sig = dedup.minhash_signatures(
            dedup.shingle_rows(docs, "doc_id", "text"), num_hashes=_NH
        ).persist()
        sig.count()
        bands = dedup.lsh_bands(sig, num_hashes=_NH).where(
            F.col("bh").isNotNull()
        )
        t0 = time.time()
        pairs = dedup.lsh_candidate_pairs(bands, max_bucket=dedup.DEFAULT_MAX_BUCKET)
        n_pairs = pairs.count()
        dt = time.time() - t0
        # recall of planted non-flood twins under the cap
        planted = docs.where(F.col("doc_id") >= 10_000_000).select(
            (F.col("doc_id") - 10_000_000).alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
        )
        n_planted = planted.count()
        found = planted.join(pairs, ["doc_a", "doc_b"], "left_semi").count()
        hot = dedup.lsh_hot_buckets(bands).agg(
            F.count(F.lit(1)).alias("n_hot"),
            F.max("bucket_size").alias("max_bucket"),
            F.sum("bucket_size").alias("rows_dropped"),
        ).collect()[0]
        out[str(m)] = {
            "n_docs": n_docs,
            "sec_pairs": round(dt, 2),
            "n_pairs": n_pairs,
            "twin_recall": round(found / max(n_planted, 1), 4),
            "n_planted": n_planted,
            "hot_buckets": int(hot["n_hot"] or 0),
            "max_hot_bucket": int(hot["max_bucket"] or 0),
            "hot_rows_dropped": int(hot["rows_dropped"] or 0),
        }
        print(json.dumps({str(m): out[str(m)]}), flush=True)
        docs.unpersist()
        sig.unpersist()
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
