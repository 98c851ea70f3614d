"""Similarity search over embedding columns (`array<float>`).

- `brute_force_knn`: exact cosine top-k — the correctness baseline. The
  query set is broadcast; the corpus streams through executors, so cost is
  O(|corpus| × |queries|) FLOPs with no corpus shuffle. Right answer for
  small query batches at any corpus size.
- `ivf_knn`: the scale path — partition-pruned search that only scans
  corpus cells matching the query's cell (here the `label` column plays the
  IVF coarse-quantizer cell id; a real deployment k-means-assigns it at
  ingest). Turns the cross product into an equi-join Catalyst shuffles on
  the cell key.

All arithmetic via JVM higher-order functions (`zip_with`/`aggregate`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def _top_k(sims: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (deterministic ties: smaller id wins)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), V.as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), V.as_double(vec_col).alias("cv")
    )
    sims = c.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", V.cosine("qv", "cv").alias("sim")
    )
    return _top_k(sims, k)


def ivf_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Partition-pruned ANN: only corpus vectors in the query's cell are
    scanned (single-probe IVF)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("cell"),
        V.as_double(vec_col).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        V.as_double(vec_col).alias("cv"),
    )
    sims = c.join(F.broadcast(q), "cell").select(
        "query_id", "neighbor_id", V.cosine("qv", "cv").alias("sim")
    )
    return _top_k(sims, k)


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF coarse-quantizer assignment: every vector → its nearest centroid
    by cosine (deterministic ties: smaller centroid id). The centroid set is
    broadcast (k centroids ≪ corpus), so the corpus streams through
    executors with no shuffle — the standard k-means assign step; iterate
    with a recompute-centroids groupBy for full k-means."""
    v = vectors.select(F.col(id_col).alias("query_id"), V.as_double(vec_col).alias("qv"))
    c = centroids.select(
        F.col(id_col).alias("neighbor_id"), V.as_double(vec_col).alias("cv")
    )
    sims = v.join(F.broadcast(c)).select(
        "query_id", "neighbor_id", V.cosine("qv", "cv").alias("sim")
    )
    return _top_k(sims, 1).select(
        F.col("query_id").alias(id_col),
        F.col("neighbor_id").alias(cent_id_col),
        "sim",
    )


def cosine_pairs(
    vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup
    detection. All-pairs form; pre-bucket (LSH/IVF) before calling at scale."""
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", V.cosine("va", "vb").alias("sim"))
        .where(F.col("sim") >= threshold)
    )
