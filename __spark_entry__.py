"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``nyc_taxi_data_warehouse_spark/``; this file only
wires the registry together.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (mart_trips_weather, J1+A2) on /root/testdata/sf0.001."""
    from nyc_taxi_data_warehouse_spark.queries_nyc import q_trips_weather

    return q_trips_weather(spark, "/root/testdata/sf0.001")


# The driver records CORRECTNESS rows for only the first 50 registry
# entries per round.  Rotate the window each round so evidence stays
# fresh; priority order used in round 3: (1) first evidence for brand-new
# queries, (2) stale-refresh for queries whose last driver row is round 1
# (including q_scd2_check / q_decontaminate, whose r1 rows were hash-FAILs
# later fixed and judge-verified) plus the newly-oracled q_kmeans_cells,
# (3) r2-green and trivially-stable r1-green queries at the tail.  New
# queries land in the middle (between FIRST and LAST), inside the window;
# tests/test_registry.py pins the bookkeeping.
_CHECK_FIRST = [
    # stale (last driver evidence: round 1)
    "q_scd2_check", "q_decontaminate", "q_interval_join", "q_window_stats",
    "q_scd2_timestamp", "q_stg_trips", "q_stg_weather", "q_enrich",
    "q_weather_hourly", "q_trips_weather", "q_daily", "q_zone_analysis",
    "q_zone_demand", "q_zone_dim", "q_antijoin", "q_fare_daily_features",
    "q_eval_metrics", "q_merge_dedup", "q_json_extract", "q_surrogate_key",
    "q_dedup_exact", "q_dedup_cluster", "q_multimodal_features",
    "q_frame_sample", "q_top_terms", "q_edit_distance", "q_lm_score",
    "q_array_ops", "q_text_scrub", "q_sample_hash", "q_sample_stratified",
    "q_percentiles",
    "q_distinct_hours", "q_top1", "q_union_summary", "q_pivot",
    "q_rollup", "q_lag_ma", "q_precip_day",
    # rows-only in r2; carries a real oracle as of round 3
    "q_kmeans_cells",
    # brand-new in round 3 (no driver evidence yet) — first evidence beats
    # re-freshening r1-green trivial queries, so five of those (q_project/
    # q_limit/q_dropna/q_semi_join/q_minmax) moved to the tail
    "q_quality_model", "q_curation_pipeline",
]
_CHECK_LAST = [
    "q_project", "q_limit", "q_dropna", "q_semi_join", "q_minmax",
    # driver-green in CORRECTNESS_r02.json; round-2 evidence stands
    "q_minhash_lsh", "q_ngram_jaccard", "q_simhash", "q_simhash_near",
    "q_text_quality", "q_token_count", "q_lang_id", "q_fingerprint",
    "q_knn_bruteforce", "q_ann_ivf", "q_centroid_assign",
    "q_embedding_neardup", "q_percentiles_approx", "q_repetition",
    "q_length_histogram", "q_split_assign", "q_dedup_keep_best",
    "q_chunk_docs", "q_pack_sequences", "q_cross_corpus_neardup",
    "q_filter_funnel", "q_mixture_sample", "q_srp_lsh", "q_cell_quality",
    "q_ann_recall", "q_srp_near_pairs", "q_stream_hourly",
    "q_inverted_index", "q_embedding_quantize", "q_star_join",
    "q_skew_agg", "q_skew_join", "q_incremental_agg", "q_lsh_recall",
    "q_cube", "q_merge_upsert", "q_weighted_sample", "q_freshness",
    "q_bm25", "q_winsorize", "q_pmi", "q_conversion_funnel",
    "q_retention_cohort", "q_backfill_synthetic", "q_quality_report",
    "q_gapfill", "q_sessions", "q_topk_per_group", "q_asof_join",
]


def _ordered(d: dict) -> dict:
    mid = [k for k in d if k not in _CHECK_FIRST and k not in _CHECK_LAST]
    keys = [k for k in _CHECK_FIRST if k in d] + mid + [
        k for k in _CHECK_LAST if k in d
    ]
    return {k: d[k] for k in keys}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline wave). Each callable: (spark, sf_dir) → DataFrame."""
    from nyc_taxi_data_warehouse_spark.queries_nyc import QUERIES as NYC

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(NYC)
    try:
        from nyc_taxi_data_warehouse_spark.queries_data import QUERIES as DATA

        out.update(DATA)
    except ImportError:
        pass
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each query (tables pre-registered as views)."""
    from nyc_taxi_data_warehouse_spark.queries_nyc import ORACLES as NYC

    out: dict[str, str] = {}
    out.update(NYC)
    try:
        from nyc_taxi_data_warehouse_spark.queries_data import ORACLES as DATA

        out.update(DATA)
    except ImportError:
        pass
    return _ordered(out)
