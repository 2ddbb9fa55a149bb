"""Guards on the catalog ORDER list vs the driver's 50-query check cap.

The driver's correctness gate hashes only the FIRST 50 registered queries,
so ORDER is load-bearing: a registration missing from it lands at an
arbitrary position relative to the cap (advisor finding, r2). These tests
make that failure mode loud.
"""

from aml_feature_store_spark import catalog

DRIVER_CAP = 50


def _ordered_names():
    return [q.name for q in catalog._ordered()]


def test_every_registered_query_is_in_order():
    catalog._ensure_loaded()
    missing = set(catalog.QUERIES) - set(catalog.ORDER)
    assert not missing, (
        f"registered queries missing from catalog.ORDER (their position vs "
        f"the driver's {DRIVER_CAP}-query cap is undefined): {sorted(missing)}"
    )


def test_order_has_no_stale_or_duplicate_names():
    catalog._ensure_loaded()
    stale = set(catalog.ORDER) - set(catalog.QUERIES)
    assert not stale, f"catalog.ORDER names no longer registered: {sorted(stale)}"
    dupes = {n for n in catalog.ORDER if catalog.ORDER.count(n) > 1}
    assert not dupes, f"duplicate names in catalog.ORDER: {sorted(dupes)}"


def test_first_50_are_all_oracle_backed():
    """Driver slots are scarce: a rows-only query inside the cap burns a
    hash-check slot for no signal."""
    catalog._ensure_loaded()
    window = _ordered_names()[:DRIVER_CAP]
    rows_only = [n for n in window if catalog.QUERIES[n].oracle is None]
    assert not rows_only, (
        f"rows-only queries occupy driver check slots: {rows_only}"
    )


def test_r5_rotated_queries_are_inside_the_cap():
    """r5 rotation (VERDICT r4 #1): the 23 oracle-backed queries that had
    never received a 2026 driver row lead the window. (Supersedes the r3
    ANN/text pin — that family got its driver rows in CORRECTNESS_r04.)"""
    window = set(_ordered_names()[:DRIVER_CAP])
    for name in (
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
        # touched-this-round keepers
        "streaming_per_event_features",
        "windowed_gini_24h",
        "ks_drift_value",
        # session-2 additions (never driver-checked before r5)
        "pagerank_bipartite",
        "bm25_rank",
        "tfidf_top_terms",
        "benchmark_decontamination",
        "unigram_logprob_quality",
        "domain_mixture_weights",
    ):
        assert name in window, f"{name} fell outside the driver cap"
