"""Sliding-window streaming aggregation — the cheap approximation of the
per-event semantics (SURVEY §2.9 T3 option b, T1/T6/T7).

``groupBy(window(ts, length, slide), user_id)`` emits one feature row per
(window, entity) instead of per event; upserted into the online table in
update mode it approximates "current trailing features" with slide-sized
staleness. Watermarking gives bounded-lateness correctness — unlike the
reference, whose watermark is wall-clock and silently mis-windows late
events (aml_stream_processor.py:353-357, the T1 quirk we fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEC = "decimal(25,2)"


def sliding_features(
    stream: DataFrame,
    window_length: str = "1 hour",
    slide: str = "5 minutes",
    watermark: str = "10 seconds",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
) -> DataFrame:
    """Streaming sliding-window aggregate per entity.

    Output: (window_start, window_end, entity, txn_count, txn_amount_sum,
    avg/max/min) — late rows beyond the watermark are dropped (and counted
    by the streaming metrics), not silently mis-assigned.
    """
    w = F.window(F.col(ts_col), window_length, slide)
    n = F.count(F.lit(1))
    s = F.sum(F.col(amount_col).cast(DEC)).cast("double")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), F.col(entity_col))
        .agg(
            n.alias("txn_count"),
            s.alias("txn_amount_sum"),
            (s / n.cast("double")).alias("avg_txn_amount"),
            F.max(amount_col).alias("max_txn_amount"),
            F.min(amount_col).alias("min_txn_amount"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            entity_col,
            "txn_count",
            "txn_amount_sum",
            "avg_txn_amount",
            "max_txn_amount",
            "min_txn_amount",
        )
    )


def tumbling_rollup(
    stream: DataFrame,
    length: str = "10 minutes",
    watermark: str = "10 seconds",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
) -> DataFrame:
    """Tumbling-window rollup (T6/A21): the streaming twin of the batch
    time_bucket_rollup query."""
    return sliding_features(
        stream, length, length, watermark, entity_col, ts_col, amount_col
    )
