"""Registered queries: streaming operators driven as bounded streams
(SURVEY §2.9 T1-T9). The per-event stateful processor is oracle-checked —
its contract is exactly the batch range-frame window semantics, so the
ANSI window SQL is its spec; the sliding/watermark query is rows-only
(append-mode emission depends on watermark progression, which is not a
deterministic relational function of the input)."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..sources.tables import isolate_events_files, stream_events
from ..streaming.per_event import run_bounded
from ..streaming.sliding import tumbling_rollup

_PER_EVENT_ORACLE = """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
  COUNT(*) OVER w5 AS txn_count_5m,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) OVER w5 AS DOUBLE) AS txn_amount_sum_5m,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) OVER w5 AS DOUBLE) / CAST(COUNT(*) OVER w5 AS DOUBLE)
    AS avg_txn_amount_5m,
  MAX(value) OVER w5 AS max_txn_amount_5m,
  MIN(value) OVER w5 AS min_txn_amount_5m,
  COUNT(*) OVER w1 AS txn_count_1h,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) OVER w1 AS DOUBLE) AS txn_amount_sum_1h,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) OVER w1 AS DOUBLE) / CAST(COUNT(*) OVER w1 AS DOUBLE)
    AS avg_txn_amount_1h,
  MAX(value) OVER w1 AS max_txn_amount_1h,
  MIN(value) OVER w1 AS min_txn_amount_1h
FROM events
WINDOW
  w5 AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
         RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW),
  w1 AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
         RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
"""


@register("streaming_per_event_features", oracle=_PER_EVENT_ORACLE)
def streaming_per_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing features via the applyInPandasWithState processor,
    driven over a bounded file stream (availableNow) — output must equal
    the batch window SQL row-for-row (online/offline consistency, the
    property the reference only claims; README.md:163)."""
    src = isolate_events_files(sf_dir)
    name = f"pe_q_{uuid.uuid4().hex[:8]}"
    return run_bounded(spark, src, {"5m": 300, "1h": 3600}, query_name=name)


@register("streaming_tumbling_rollup", oracle=None)
def streaming_tumbling_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling 10-minute rollup per user in append mode (T1/T6
    — event-time watermark, unlike the reference's wall-clock assigner).
    Rows-only: append emission depends on watermark progression."""
    src = isolate_events_files(sf_dir)
    events = stream_events(spark, src)
    out = tumbling_rollup(events, length="10 minutes")
    # append mode supports a file sink: executor-parallel writes instead
    # of collecting the emission into the driver (complete-mode twins
    # must keep the memory sink - file sinks are append-only)
    dst = tempfile.mkdtemp(prefix="out_roll_")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dst)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # schema-pinned read: an empty emission (watermark never advanced)
    # must return an empty frame, not an inference error
    return spark.read.schema(out.schema).parquet(dst)


_TUMBLING_COMPLETE_ORACLE = """
SELECT make_timestamp((epoch_ms(ts) // 600000) * 600000000) AS window_start,
       make_timestamp(((epoch_ms(ts) // 600000) + 1) * 600000000) AS window_end,
       user_id,
       COUNT(*) AS txn_count,
       CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS txn_amount_sum,
       CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_txn_amount,
       MAX(value) AS max_txn_amount,
       MIN(value) AS min_txn_amount
FROM events
GROUP BY 1, 2, 3
"""


@register("streaming_tumbling_complete", oracle=_TUMBLING_COMPLETE_ORACLE)
def streaming_tumbling_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute rollup per user in COMPLETE mode over a bounded
    stream (T6): complete-mode output of a streaming aggregation over a
    finished stream is exactly the batch groupBy, so unlike the
    watermark-dependent append twin this one is oracle-checked — the
    stream/batch consistency claim for windowed aggregation, verified."""
    src = isolate_events_files(sf_dir)
    events = stream_events(spark, src)
    out = tumbling_rollup(events, length="10 minutes")
    name = f"rollc_q_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
