"""Streaming dial-up probe (verdict r9 #7): the state-partition story at
8× feed volume.

`util.stream_state_partitions` pins a stateful stream's state-store
count at 8 because at sf0.1 the per-batch checkpoint commit (one file
per store per partition) dominated kilobyte-sized state. The claim
being verified here: that was FIXED cost, so when the FEED grows 8×
(content growth: replicas shift ids and jitter ts/values so join keys
and sketch state genuinely grow), drain time grows far less than 8× —
the fixed machinery amortizes and real work takes over. At cluster
scale the partition dial then goes UP with state volume; this probe is
the evidence the dial-up story rests on.

Usage:  python tools/stream_volume_probe.py [sf_dir] [mults...]
        (defaults: /root/testdata/sf0.1, multiples 1 8)
Prints one PROBE line per (query, mult) and a final JSON summary.
Run on an idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators import sketches
from nyc_taxi_data_warehouse_spark.plans import nyc_views
from nyc_taxi_data_warehouse_spark.session import get_spark
from nyc_taxi_data_warehouse_spark.streaming import weather_stream
from nyc_taxi_data_warehouse_spark.util import (
    stream_feed,
    stream_state_partitions,
)

_SEQ = [0]


def _grow(df, mult: int, id_col: str, ts_col: str):
    """Content-growth replication for a TEMPORAL stream: shifted ids and
    replicas displaced 40 days apart, so the time AXIS grows mult× and
    each replica only ever matches its own 40-day era. Jittering ts by
    seconds instead (the batch probes' trick) would densify the same
    join windows — 8× volume on both sides of a temporal join would
    octuple window density and grow the MATCH set 64×, which measures
    output explosion, not feed volume (first probe run made exactly
    that mistake and timed out)."""
    if mult == 1:
        return df
    cols = df.columns
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep"), *cols
    ).select(
        *[
            (F.col(id_col) * mult + F.col("rep")).alias(id_col)
            if c == id_col
            else (
                F.col(ts_col) + F.make_interval(days=F.col("rep") * 40)
            ).alias(ts_col)
            if c == ts_col
            else F.col(c)
            for c in cols
        ]
    )


def _drain(spark, plan, output_mode: str) -> float:
    _SEQ[0] += 1
    name = f"svp_sink_{_SEQ[0]}"
    t0 = time.perf_counter()
    with stream_state_partitions(spark, 8):
        q = weather_stream.run_available_now(plan, name, output_mode=output_mode)
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("drain timed out")
    q.stop()
    dt = time.perf_counter() - t0
    n = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return round(dt, 3), n


def probe_stream_join(spark, sf_dir: str, mult: int):
    t = nyc_views.load_tables(spark, sf_dir)
    wx = _grow(
        nyc_views.weather_from_events(t["events"]).select(
            "obs_id", "observed_at"
        ),
        mult,
        "obs_id",
        "observed_at",
    )
    errs = _grow(
        t["events"]
        .where(F.col("event_type") == "error")
        .select("event_id", "ts"),
        mult,
        "event_id",
        "ts",
    )
    src_a = stream_feed(errs, f"svp_err_{mult}", f"{sf_dir}#{mult}", n_files=4 * mult)
    src_b = stream_feed(wx, f"svp_wx_{mult}", f"{sf_dir}#{mult}", n_files=2 * mult)
    sa = (
        spark.readStream.schema("event_id bigint, ts timestamp")
        .parquet(src_a)
        .withWatermark("ts", "2 hours")
        .withColumn("bucket", F.date_trunc("hour", "ts"))
    )
    sb = (
        spark.readStream.schema("obs_id bigint, observed_at timestamp")
        .parquet(src_b)
        .withWatermark("observed_at", "2 hours")
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.date_trunc("hour", "observed_at"),
                    F.date_trunc("hour", "observed_at")
                    + F.expr("interval 1 hour"),
                )
            ),
        )
    )
    j = sa.join(
        sb,
        (sa["bucket"] == sb["bucket"])
        & F.expr("observed_at > ts - interval 30 minutes AND observed_at <= ts"),
        "inner",
    )
    return _drain(spark, j, "append")


def probe_stream_hll(spark, sf_dir: str, mult: int):
    t = nyc_views.load_tables(spark, sf_dir)
    # day-shifted replicas grow the day-window count (and so the HLL
    # register state) mult× along with the row volume
    w = _grow(
        nyc_views.weather_from_events(t["events"]),
        mult,
        "obs_id",
        "observed_at",
    )
    src = stream_feed(w, f"svp_hll_{mult}", f"{sf_dir}#{mult}", n_files=2 * mult)
    val = F.concat_ws(
        "|",
        F.floor(F.col("temp_f") * 10 + F.lit(0.5)).cast("long"),
        F.col("humidity_pct").cast("long"),
    )
    stream = weather_stream.read_weather_stream(spark, src)
    rows = (
        stream.withWatermark("observed_at", "2 hours")
        .where(
            F.col("observed_at").isNotNull()
            & F.col("temp_f").isNotNull()
            & F.col("humidity_pct").isNotNull()
        )
        .select(F.window("observed_at", "1 day").alias("win"), val.alias("__v"))
        .select("win", sketches._h60(F.col("__v")).alias("__h"))
        .select(
            "win",
            F.col("__h").bitwiseAND((1 << 9) - 1).cast("int").alias("bucket"),
            F.when(F.shiftright("__h", 9) == 0, F.lit(60 - 9 + 1))
            .otherwise(
                F.lit(60 - 9 + 1) - F.length(F.conv(F.shiftright("__h", 9), 10, 2))
            )
            .cast("int")
            .alias("__rho"),
        )
    )
    regs = rows.groupBy("win", "bucket").agg(F.max("__rho").alias("rho"))
    return _drain(spark, regs, "complete")


def probe_stream_ingest(spark, sf_dir: str, mult: int):
    """Round-11 streaming ingest-dedup preflight at mult× BOTH sides:
    the store's hash set grows with history, the feed with the batch
    (content growth: suffix-shifted replica texts so hashes are genuinely
    distinct).  The stream pays a stateless md5 + broadcast hash join +
    a 16-row shard counter — growth should track the feed scan, not the
    join (the state is fixed-size by construction)."""
    from nyc_taxi_data_warehouse_spark.queries_data import (
        _ingest_generations,
    )

    hist, batch = _ingest_generations(spark, sf_dir)

    def grow(d):
        if mult == 1:
            return d
        return d.select(
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep"),
            "doc_id",
            "text",
        ).select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
            F.expr("substring(text, rep * 7 + 1)").alias("text"),
        )

    hist, batch = grow(hist), grow(batch)
    known = (
        hist.select(F.md5("text").alias("content_hash"))
        .distinct()
        .withColumn("__k", F.lit(1))
    )
    src = stream_feed(
        batch, f"svp_ingest_{mult}", f"{sf_dir}#{mult}", n_files=4 * mult
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 8)
        .parquet(src)
    )
    agg = (
        stream.select(
            (F.col("doc_id") % 16).alias("shard"),
            F.md5("text").alias("content_hash"),
        )
        .join(F.broadcast(known), "content_hash", "left")
        .groupBy("shard")
        .agg(
            F.sum(F.when(F.col("__k").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_known"),
            F.sum(F.when(F.col("__k").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
    )
    return _drain(spark, agg, "complete")


def probe_stream_mg(spark, sf_dir: str, mult: int):
    """Streaming MG(k) at mult× feed: replicas shift NON-heavy keys (the
    planted heavy keys 0/1 keep their global share, so the summary stays
    meaningful) — state is ≤ k rows per shard at any volume, so drain
    growth should track the feed scan + the per-batch pandas fold."""
    from pyspark.sql import types as ST

    from nyc_taxi_data_warehouse_spark.streaming.topk_stream import (
        mg_topk_stream,
    )

    t = nyc_views.load_tables(spark, sf_dir)
    ev = t["events"].where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    skey = F.when(F.col("user_id") % 4 < 2, F.col("user_id") % 4).otherwise(
        F.col("user_id")
    )
    feed = ev.select(skey.alias("key"))
    if mult > 1:
        feed = feed.select(
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep"),
            "key",
        ).select(
            F.when(F.col("key") < 2, F.col("key"))
            .otherwise(F.col("key") * mult + F.col("rep"))
            .alias("key")
        )
    src = stream_feed(
        feed, f"svp_mg_{mult}", f"{sf_dir}#{mult}", n_files=4 * mult
    )
    stream = (
        spark.readStream.schema(
            ST.StructType([ST.StructField("key", ST.LongType())])
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(src)
        .withColumn(
            "shard",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("key").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(8),
            ).cast("int"),
        )
    )
    return _drain(spark, mg_topk_stream(stream, k=16), "update")


def probe_stream_histogram(spark, sf_dir: str, mult: int):
    """Streaming fixed-ruler histogram at mult× feed: replicas displace
    40 days (the temporal-growth rule), so DAYS grow with volume while
    state stays days × ≤ruler bins — per-day state is constant, total
    state grows only with the time axis, never the feed density."""
    w = nyc_views.weather_from_events(
        nyc_views.load_tables(spark, sf_dir)["events"]
    ).select("obs_id", "observed_at", "temp_f")
    w = _grow(w, mult, "obs_id", "observed_at")
    src = stream_feed(
        w, f"svp_hist_{mult}", f"{sf_dir}#{mult}", n_files=4 * mult
    )
    stream = (
        spark.readStream.schema(
            "obs_id bigint, observed_at timestamp, temp_f double"
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(src)
    )
    regs = (
        stream.withWatermark("observed_at", "2 hours")
        .where(
            F.col("observed_at").isNotNull() & F.col("temp_f").isNotNull()
        )
        .select(
            F.window("observed_at", "1 day").alias("win"),
            F.expr(
                "CAST((CAST(floor(temp_f * 10 + 0.5) AS BIGINT) + 2000)"
                " div 50 AS BIGINT)"
            ).alias("bin"),
        )
        .groupBy("win", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return _drain(spark, regs, "complete")


def probe_stream_cdc(spark, sf_dir: str, mult: int):
    """Streaming CDC upsert view at mult× log volume: replicas shift
    user ids (content growth — the KEY universe grows with the log), so
    state grows with keys × 1 struct, never with ops per key."""
    ev = nyc_views.load_tables(spark, sf_dir)["events"].where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    log = ev.select(
        "user_id", "ts", "event_id",
        (F.col("event_type") == "error").alias("is_delete"), "value",
    )
    if mult > 1:
        log = log.select(
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep"),
            *log.columns,
        ).select(
            (F.col("user_id") * mult + F.col("rep")).alias("user_id"),
            "ts",
            (F.col("event_id") * mult + F.col("rep")).alias("event_id"),
            "is_delete", "value",
        )
    src = stream_feed(
        log, f"svp_cdc_{mult}", f"{sf_dir}#{mult}", n_files=4 * mult
    )
    stream = (
        spark.readStream.schema(
            "user_id bigint, ts timestamp, event_id bigint,"
            " is_delete boolean, value double"
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(src)
    )
    agg = stream.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "is_delete", "value")).alias("w")
    )
    return _drain(spark, agg, "complete")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(x) for x in sys.argv[2:]] or [1, 8]
    spark = get_spark("stream_volume_probe")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    only = set(os.environ.get("SVP_ONLY", "").split(",")) - {""}
    probes = (
        ("stream_join", probe_stream_join),
        ("stream_hll", probe_stream_hll),
        ("stream_ingest_dedup", probe_stream_ingest),
        ("stream_mg_topk", probe_stream_mg),
        ("stream_histogram", probe_stream_histogram),
        ("stream_cdc", probe_stream_cdc),
    )
    for name, fn in probes:
        if only and name not in only:
            continue
        fn(spark, sf_dir, 1)  # warmup: JVM/codegen/first-checkpoint cost
        times: dict[str, object] = {}
        for m in mults:
            dt, n = fn(spark, sf_dir, m)
            times[str(m)] = dt
            times[f"rows_{m}"] = n
            print(f"PROBE {name} mult={m} {dt}s rows={n}", flush=True)
        times[f"growth_{mults[-1]}x"] = round(
            times[str(mults[-1])] / times[str(mults[0])], 2
        )
        report[name] = times
    print(json.dumps(report))


if __name__ == "__main__":
    main()
