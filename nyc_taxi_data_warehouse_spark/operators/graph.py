"""Iterative graph analytics over edge frames — PageRank on the integer
lattice.

PageRank's distributed shape is the classic per-iteration pattern: join
ranks to edges on src (one shuffle), partial-sum contributions per dst
(map-side combine), rebuild the rank frame. What this module adds is
BIT-REPRODUCIBILITY: plain float PageRank sums contributions in
partition order, so two runs (or an engine and its SQL oracle) disagree
in the last ulps. Here every quantity is an integer:

- ranks live on a ``scale``-denominated lattice (default 1e9 units);
- each edge contributes ``floor(r_u · w_uv / W_u)`` — exact-integer
  (the double division is correctly rounded and the quotient's distance
  to an integer, when fractional, is ≥ 1/W_u, far above ulp at rank
  magnitude — the repo's standard floor-division safety argument);
- damping applies as ``floor(85 · x / 100)``, teleport as
  ``floor(15 · scale / (100 · n))``;
- dangling mass (nodes with no out-edges) redistributes uniformly as
  ``floor(D / n)``.

Floor losses mean total mass decays by a few units per iteration —
irrelevant for ranking, essential for cross-engine hash equality.

No driver-side scalars: node count, teleport, and dangling mass all
ride 1-row broadcast-aggregate crossJoins (the corpus-stats shape), so
the whole n-iteration computation is one lazy Catalyst plan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted PageRank (damping 0.85) over (src, dst, weight) edges;
    returns (node, rank) with rank on the integer ``scale`` lattice.

    Per iteration: edges ⋈ ranks on src (the one real shuffle at graph
    scale), per-dst integer partial sums, dangling mass via an anti-join
    1-row aggregate. With ``checkpoint`` (default) each iteration's rank
    frame is localCheckpoint-ed — the Pregel discipline: the rank frame
    is node-sized (small next to edges), and without truncation the
    lazy plan doubles per iteration (each round re-derives the previous
    round's whole lineage on both the contribution and dangling
    branches — audited at 299 exchanges for 3 iterations un-truncated,
    ~10 with). ``checkpoint=False`` keeps the computation one lazy plan
    for callers composing further."""
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("__n"))
    outw = e.groupBy("src").agg(F.sum("w").alias("__outw"))

    r = nodes.crossJoin(F.broadcast(n_df)).select(
        "node",
        F.floor(F.lit(float(scale)) / F.col("__n")).cast("long").alias("r"),
    )
    for _ in range(n_iter):
        contrib = (
            e.join(outw, "src")
            .join(r.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    F.col("r").cast("double") * F.col("w") / F.col("__outw")
                ).cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        dang = (
            r.join(outw.select(F.col("src").alias("node")), "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("__dang"))
        )
        r = (
            nodes.crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dang))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.floor(
                        F.lit(15.0) * scale / (F.lit(100) * F.col("__n"))
                    ).cast("long")
                    + F.floor(
                        F.lit(85.0)
                        * (
                            F.coalesce(F.col("c"), F.lit(0))
                            + F.floor(
                                F.col("__dang").cast("double") / F.col("__n")
                            ).cast("long")
                        )
                        / 100
                    ).cast("long")
                ).alias("r"),
            )
        )
        if checkpoint:
            r = r.localCheckpoint(eager=True)
    return r.select("node", F.col("r").alias("rank"))
