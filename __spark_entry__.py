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
# fresh; priority order (round 4, third session): (0) the 18 queries
# added this session plus the 15 earlier-round-4 never-gated ones —
# first-evidence beats everything, (1) stale-refresh for queries whose
# last driver row is round 1, (2) queries whose semantics or oracles
# changed in round 4, (3) whatever r2-green entries still fit.
# _CHECK_FIRST now fills ALL 50 window slots, so a NEW query only gets
# driver evidence if it is ADDED TO _CHECK_FIRST (displacing a tail
# entry into _CHECK_LAST) — the old "new queries land mid-registry,
# inside the window" behavior no longer applies.
# tests/test_registry.py pins the bookkeeping.
_CHECK_FIRST = [
    # (0) first-evidence: never driver-gated (third-session wave first:
    # dup-ngram coverage, sparse cosine, bloom join, MAD anomalies; then
    # the 4 mid-round-4 additions + the extension wave: lake roundtrips,
    # PQ/IVFADC family, BPE, z-order, PageRank) — highest priority
    "q_dup_ngram_coverage", "q_sparse_cosine", "q_bloom_join",
    "q_anomaly_mad", "q_source_overlap", "q_feature_binning",
    "q_snapshot_diff", "q_rolling_median", "q_prefix_filter_pairs",
    "q_variant_json", "q_crosstab_independence", "q_stream_sessions",
    "q_event_paths", "q_langid_eval", "q_demand_corr", "q_iceberg_diff",
    "q_cdc_classify", "q_stream_join", "q_preference_pairs",
    "q_negative_samples", "q_shard_checksums", "q_embedding_stats",
    "q_dedup_plan",
    "q_lsh_hot_buckets", "q_containment", "q_normalize_dedup",
    "q_delta_roundtrip", "q_iceberg_roundtrip", "q_pq_codebook",
    "q_pq_search", "q_pq_recall", "q_ivfpq_search", "q_bpe_merges",
    "q_bpe_tokenize", "q_zorder_cells", "q_pagerank_zones", "q_triangle_count", "q_orc_roundtrip",
    # (1) stale: last driver evidence is round 1
    "q_dropna", "q_limit", "q_minmax", "q_semi_join",
    # (2) touched this round: banded SimHash + capped-LSH oracles, and the
    # assignment/codebook family riding assign_cells/kmeans_fit_exact
    "q_simhash", "q_simhash_near", "q_minhash_lsh", "q_cross_corpus_neardup",
    "q_lsh_recall", "q_centroid_assign", "q_ann_ivf", "q_ann_recall",
]
_CHECK_LAST = [
    "q_embedding_neardup", "q_cell_quality",
    # (3) overflow: r2-green entries that no longer fit — round-5 window
    # candidates, oldest evidence first
    "q_knn_bruteforce", "q_stream_hourly", "q_ngram_jaccard",
    "q_text_quality", "q_split_assign",
    "q_dedup_keep_best", "q_chunk_docs", "q_pack_sequences",
    # deferred r2-green (window overflow + trivial per-row text
    # functions, untouched this round) — round-5 window candidates
    "q_mixture_sample", "q_srp_lsh",
    "q_srp_near_pairs", "q_inverted_index",
    "q_embedding_quantize", "q_star_join",
    "q_skew_agg", "q_skew_join", "q_incremental_agg",
    "q_cube", "q_merge_upsert", "q_weighted_sample", "q_freshness",
    "q_bm25", "q_winsorize", "q_pmi", "q_conversion_funnel", "q_retention_cohort", "q_backfill_synthetic",
    "q_quality_report", "q_gapfill", "q_sessions", "q_topk_per_group",
    "q_asof_join",
    "q_token_count", "q_lang_id", "q_fingerprint", "q_repetition",
    "q_length_histogram", "q_percentiles_approx", "q_filter_funnel",
    # r3-green (freshest evidence)
    "q_scd2_check", "q_decontaminate", "q_interval_join", "q_window_stats",
    "q_scd2_timestamp", "q_stg_trips", "q_stg_weather", "q_enrich",
    "q_weather_hourly", "q_trips_weather", "q_daily", "q_zone_analysis",
    "q_zone_demand", "q_zone_dim", "q_antijoin", "q_fare_daily_features",
    "q_eval_metrics", "q_merge_dedup", "q_json_extract", "q_surrogate_key",
    "q_dedup_exact", "q_dedup_cluster", "q_multimodal_features",
    "q_frame_sample", "q_top_terms", "q_edit_distance", "q_lm_score",
    "q_array_ops", "q_text_scrub", "q_sample_hash", "q_sample_stratified",
    "q_percentiles", "q_distinct_hours", "q_top1", "q_union_summary",
    "q_pivot", "q_rollup", "q_lag_ma", "q_precip_day", "q_kmeans_cells",
    "q_quality_model", "q_curation_pipeline", "q_forecast_eval",
    "q_boilerplate", "q_dup_rate_by_source", "q_epoch_shuffle",
    "q_stream_dedup", "q_char_entropy", "q_profile_columns",
    "q_project",
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
