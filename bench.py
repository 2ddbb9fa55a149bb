"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Materialization is a noop-sink write (not count()) so Catalyst cannot prune
the computed columns away — every query pays its full plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "trailing_multiwindow_features",
    "unique_counts_windows",
    "conditional_window_counts",
    "pit_join_purchases_24h",
    "behavioral_feature_vector",
    "online_feature_view",
    "risk_scores",
    "graph_edge_list",
    "user_graph_degrees",
    "pricing_summary",
    "regional_revenue",
    "top_orders_per_customer",
    "time_bucket_rollup",
    "quantiles_by_event_type",
    "trailing_sums_cumsum_strategy",
    "windowed_gini_24h",
    "windowed_hhi_24h",
    "user_sessions",
    "ks_drift_value",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_stats",
    "knn_cosine_bruteforce",
    "streaming_per_event_features",
]

# events-only queries re-run against the 10x generated events table
# (the scale dir carries only events.parquet)
SCALE_HEADLINE = [
    "trailing_multiwindow_features",
    "trailing_sums_cumsum_strategy",
    "streaming_per_event_features",
    "windowed_gini_24h",
    "windowed_hhi_24h",
    "behavioral_feature_vector",
    "conditional_window_counts",
    "user_sessions",
    "user_graph_degrees",
    "pit_join_purchases_24h",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from aml_feature_store_spark.catalog import queries
    from aml_feature_store_spark.session import get_spark

    spark = get_spark("bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE and os.environ.get("BENCH_ALL")
    ]

    # warm the JVM/parquet footer caches once with the cheapest plan
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline-query wall time, noop sink",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
    }
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        out["sf"] = float(sf)
    except ValueError:
        out["sf"] = None

    # scaling anchor: events-based headliners against a 10x events table
    # (tools/gen_scale.py writes it; absent => section omitted)
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1"),
    )
    if os.path.exists(os.path.join(scale_dir, "events.parquet")):
        scale_timings: dict[str, float] = {}
        for name in SCALE_HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, scale_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            scale_timings[name] = round(time.perf_counter() - t0, 3)
        out["scale"] = {
            "sf": 1.0,
            "n_events": 1_000_000,
            "value": round(sum(scale_timings.values()), 3),
            "queries": scale_timings,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
