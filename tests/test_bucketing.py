"""Bucketed co-located join: the shuffle-free big-big join path.

At 100 TB the trips⋈weather-hour or fact⋈fact joins can't broadcast; the
scale answer is bucketing both sides on the join key at write time so the
join needs NO exchange at read time. This test proves the engine's layout
produces that plan: same bucket count + key on both tables → SortMergeJoin
with zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_needs_no_shuffle(spark, sf_dir):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(warehouse.removeprefix("file:") + f"/{t}", ignore_errors=True)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )

    # at test scale Catalyst would broadcast; disable it to surface the
    # big-big plan shape that matters at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j.select("l_orderkey", "l_quantity", "o_orderdate"))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: co-located buckets -> zero exchanges
        assert "Exchange" not in plan, plan

        # and the join is still correct
        assert j.count() == lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
