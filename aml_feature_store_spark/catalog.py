"""Registry of the engine's public queries + their DuckDB oracle SQL.

Every operator from SURVEY.md §2 that the engine claims as done gets a
``@register("name", oracle=...)`` entry here; ``__spark_entry__.py``
exposes them to the driver. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).

Queries with no SQL-expressible oracle (stateful streaming, iterative
algorithms) register with ``oracle=None`` → driver records rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}

# Explicit presentation order. The driver correctness gate checks the FIRST
# 50 registered queries only, so the engine-core families (trailing windows,
# streaming per-event, windowed stats, per-user stats, serving, drift, graph,
# LLM pipeline) are listed first; trivial coverage queries and rows-only
# (oracle-less) queries come last. Names not listed keep insertion order
# after the listed ones.
ORDER = [
    # --- r5 rotation (VERDICT r4 #1): every oracle-bearing query that has
    # never had a 2026 driver row sits in the 50-slot window — the 23
    # rows rotated in from past caps plus the queries NEW in r5
    # (repetition_stats, stratified_sample, sequence_lag_features,
    # dbscan_outliers_sliced, landmark_closeness, span_dup_coverage);
    # multi-round-green r4 rows rotated out below ---
    "dedup_components_lsh",
    "session_window_rollup",
    "ann_ivf_index_topk",
    "dow_entropy_per_user",
    "graph_edge_list",
    "trailing_1h_features",
    "daily_counts_per_user",
    "unique_counts_windows",
    "derived_time_flags",
    "running_totals_per_user",
    "props_json_extract",
    "multimodal_binary_stats",
    "pricing_summary",
    "regional_revenue",
    "top_orders_per_customer",
    "time_bucket_rollup",
    "quantiles_by_event_type",
    "mktsegment_acctbal_summary",
    "salted_user_totals",
    "revenue_rollup_region_nation",
    "top_events_global",
    "event_type_pivot",
    "timestamp_functions",
    # --- keepers: r4-green rows staying in the window because they cover
    # code paths touched this round (per-event state rewrite, prefix sums,
    # windowed-stats kernel) or are the flagship / family representatives
    "trailing_multiwindow_features",
    "trailing_sums_cumsum_strategy",
    "pagerank_bipartite",
    "streaming_per_event_features",
    "bm25_rank",
    "tfidf_top_terms",
    "streaming_per_event_extended",
    "windowed_gini_24h",
    "windowed_hhi_24h",
    "benchmark_decontamination",
    "pit_join_purchases_24h",
    "repetition_stats",
    "risk_scores",
    "behavioral_feature_vector",
    "stratified_sample",
    "interarrival_stats_per_user",
    "unigram_logprob_quality",
    "conditional_window_counts",
    "user_sessions",
    "ks_drift_value",
    "domain_mixture_weights",
    "sequence_lag_features",
    "curate_training_docs",
    "dedup_minhash_lsh",
    "dbscan_outliers_sliced",
    "landmark_closeness",
    "span_dup_coverage",
    # --- driver cap boundary (50) is here; below are rotated-out rows,
    # every one driver-green in CORRECTNESS_r04 (and most in r1/r2 too),
    # then rows-only queries ---
    # --- rotated out in r5 session 2: all six hold green 2026 driver rows
    # (CORRECTNESS_r04) — swapped for the six queries NEW this session so
    # the driver certifies them too ---
    "merchant_trailing_features",
    "streaming_graph_edges",
    "streaming_tumbling_complete",
    "windowed_entropy_24h",
    "population_zscore_per_user",
    "model_auc",
    "user_clustering_coeff",
    "risk_shapley",
    "online_feature_view",
    "dedup_simhash",
    "ann_ivf_topk",
    "embedding_near_dup_pairs",
    "batch_score_requests",
    "risk_explanations",
    "gini_per_user",
    "hhi_per_user",
    "hour_entropy_per_user",
    "amount_trend_per_user",
    "moments_per_user",
    "model_eval_metrics",
    "retrain_decision",
    "pandas_udf_model_scores",
    "feature_target_correlation",
    "user_graph_degrees",
    "merchant_graph_features",
    "user_shared_k_pairs",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "knn_cosine_bruteforce",
    "ann_ivf_multiprobe",
    "ann_recall_at_k",
    "ann_ivf_topk_refined",
    "ann_recall_refined",
    "text_stats",
    "language_id",
    "doc_fingerprints",
    # rows-only (no oracle) — a driver slot spent here yields no hash signal
    "dbscan_outlier_features",
    "model_training_summary",
    "gbt_training_summary",
    "gbt_feature_contributions",
    "gbt_shap_values",
    "gbt_lime_weights",
    "gbt_nl_explanations",
    "mlp_training_summary",
    "automl_tuning_summary",
    "sequence_mlp_summary",
    "stacking_ensemble_scores",
    "voting_ensemble_scores",
    "pca_anomaly_scores",
    "graph_global_centralities",
    "seeded_sample",
    "multimodal_image_features",
    "multimodal_decode_features",
    "multimodal_png_features",
    "multimodal_resize_features",
    "bm25_index_topk",
    "multimodal_jpeg_features",
    "multimodal_video_features",
    "audio_spectral_features",
    "multimodal_frame_sample",
    "streaming_tumbling_rollup",
    "unique_users_approx_by_type",
    "quantiles_approx_by_event_type",
    "streaming_dedup_events",
    "streaming_interval_join",
    "embedding_pca_component",
    "embedding_pca_scores",
    "robust_zscore_outliers",
    "revenue_cube_by_type_dow",
    "psi_drift_value",
    "chi2_drift_event_type",
    "model_calibration_bins",
    "shipping_priority_q3",
    "streaming_dim_enrich",
    "promo_revenue_q14",
    "funnel_conversion",
    "cohort_retention_weekly",
    "rfm_segments",
    "event_type_transitions",
    "basket_lift_pairs",
    "hits_bipartite",
    "cusum_changepoint",
    "viewers_never_purchased",
    "data_quality_profile",
]


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = RegisteredQuery(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _ordered() -> list[RegisteredQuery]:
    _ensure_loaded()
    rank = {name: i for i, name in enumerate(ORDER)}
    return sorted(
        QUERIES.values(),
        key=lambda q: (rank.get(q.name, len(ORDER)), list(QUERIES).index(q.name)),
    )


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effects)."""
    global _loaded
    if _loaded:
        return
    from . import queries as _q  # noqa: F401  (package of @register modules)

    _loaded = True
