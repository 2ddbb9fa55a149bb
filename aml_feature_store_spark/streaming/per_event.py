"""Per-event trailing-window features over a stream (SURVEY §2.9 T3/T4/T5).

The reference's core streaming semantic: on EVERY event, emit that
entity's full feature vector over multiple trailing windows (reference:
flink_job/aml_stream_processor.py:64-201 ListState; flink_job/
real_time_processor.py:78-230 MapState). Spark has no built-in operator
for this — sliding windows emit per-window, not per-event — so this is a
custom stateful processor on ``applyInPandasWithState``:

- keyed state = the entity's event buffer (ts_ms, value) within the
  largest window (the ListState equivalent, with watermark-free manual
  eviction exactly like the reference's purge, but event-time-correct);
- per micro-batch: merge batch rows into the buffer in event-time order,
  emit one output row per input event with all window aggregates;
- events sharing the same ts are processed as one group (each sees the
  others), matching the batch range-frame peer semantics — so
  stream output ≡ batch window output when per-key arrival respects
  event-time order (the online/offline consistency property the
  reference only simulates, README.md:163).

Scale notes: state per key is bounded by (max window × per-key rate),
NOT stream length — eviction runs every batch. Arrow-batched transfer;
compute is O(batch × log buffer) via binary search on the sorted buffer.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_WINDOWS = {"5m": 300, "1h": 3600}

# buffers are stored as raw little-endian byte blobs, not ARRAY<...>:
# state round-trips happen every micro-batch for every key, and
# numpy.tobytes()/frombuffer is a memcpy while array-typed state converts
# element-by-element through Python objects
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ms", T.BinaryType()),
        T.StructField("val", T.BinaryType()),
    ]
)


def output_schema(windows: dict[str, int]) -> T.StructType:
    fields = [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
    for w in windows:
        fields += [
            T.StructField(f"txn_count_{w}", T.LongType()),
            T.StructField(f"txn_amount_sum_{w}", T.DoubleType()),
            T.StructField(f"avg_txn_amount_{w}", T.DoubleType()),
            T.StructField(f"max_txn_amount_{w}", T.DoubleType()),
            T.StructField(f"min_txn_amount_{w}", T.DoubleType()),
        ]
    return T.StructType(fields)


def _processor(windows: dict[str, int]):
    max_w_ms = max(windows.values()) * 1000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ms_raw, val_raw = state.get
            ms_buf = np.frombuffer(ms_raw, dtype="<i8")
            val_buf = np.frombuffer(val_raw, dtype="<f8")
        else:
            ms_buf = np.empty(0, dtype=np.int64)
            val_buf = np.empty(0, dtype=np.float64)

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.dropna(subset=["ts_ms", "event_id"]).sort_values(
            ["ts_ms", "event_id"], ignore_index=True
        )
        b_ms = batch["ts_ms"].to_numpy(np.int64)
        b_val = batch["value"].to_numpy(np.float64)

        # merge the whole batch into the buffer up front, then evaluate
        # every event's frames vectorized against the merged arrays. The
        # frame [ts−W, ts] only sees rows with ms ≤ ts, so later-ts batch
        # rows in the buffer cannot leak into earlier frames; equal-ts
        # peers see each other — exactly the batch RANGE-frame semantics,
        # for in-order AND out-of-order arrival within a batch.
        order = np.argsort(np.concatenate([ms_buf, b_ms]), kind="stable")
        ms_buf = np.concatenate([ms_buf, b_ms])[order]
        val_buf = np.concatenate([val_buf, b_val])[order]
        # accumulate in integer cents: running sums are exact at any key
        # volume, and dividing once by 100.0 lands on the same double as
        # the batch plan's DECIMAL(25,2)->DOUBLE route. The round-trip
        # check enforces the 2-decimal amount contract loudly — a finer-
        # precision amount would otherwise silently diverge stream/batch.
        cents = np.round(val_buf * 100.0)
        if not np.array_equal(cents / 100.0, val_buf):
            bad = val_buf[cents / 100.0 != val_buf][:3]
            raise ValueError(
                "per-event window state requires amounts with <= 2 decimal "
                f"places (got e.g. {bad.tolist()}); widen the cents scale "
                "or pre-round the amount column explicitly"
            )
        csum = np.concatenate([[0], np.cumsum(cents.astype(np.int64))])

        cols: dict[str, Any] = {
            "user_id": np.full(len(batch), user_id, dtype=np.int64),
            "event_id": batch["event_id"].to_numpy(np.int64),
            "ts_ms": b_ms,
        }
        hi = np.searchsorted(ms_buf, b_ms, side="right")
        for wname, wsecs in windows.items():
            lo = np.searchsorted(ms_buf, b_ms - wsecs * 1000, side="left")
            n = hi - lo
            s = (csum[hi] - csum[lo]) / 100.0
            cols[f"txn_count_{wname}"] = n.astype(np.int64)
            cols[f"txn_amount_sum_{wname}"] = s
            cols[f"avg_txn_amount_{wname}"] = np.where(n > 0, s / n, 0.0)
            cols[f"max_txn_amount_{wname}"] = np.array(
                [val_buf[l:h].max() if h > l else 0.0 for l, h in zip(lo, hi)]
            )
            cols[f"min_txn_amount_{wname}"] = np.array(
                [val_buf[l:h].min() if h > l else 0.0 for l, h in zip(lo, hi)]
            )
        out_df = pd.DataFrame(cols)

        # evict state older than the largest window behind max event-time
        if len(ms_buf):
            cutoff = ms_buf[-1] - max_w_ms
            keep = ms_buf >= cutoff
            ms_buf, val_buf = ms_buf[keep], val_buf[keep]
        state.update(
            (
                np.ascontiguousarray(ms_buf, dtype="<i8").tobytes(),
                np.ascontiguousarray(val_buf, dtype="<f8").tobytes(),
            )
        )
        yield out_df[[f.name for f in output_schema(windows)]]

    return fn


def per_event_features(
    stream: DataFrame, windows: dict[str, int] | None = None
) -> DataFrame:
    """Apply the per-event stateful processor to a streaming DataFrame with
    columns (user_id, event_id, ts, value). Returns the streaming output."""
    windows = windows or DEFAULT_WINDOWS
    prepared = stream.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _processor(windows),
        outputStructType=output_schema(windows),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_bounded(
    spark,
    source_dir: str,
    windows: dict[str, int] | None = None,
    query_name: str = "per_event_features",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the per-event processor over a bounded file stream to
    completion (availableNow) and return the materialized result.

    ``source_dir`` may be a directory of event-shaped parquet files, or a
    testdata sf dir — in the latter case only events.parquet is streamed
    (the file source would otherwise read every table in the dir)."""
    import glob
    import shutil
    import tempfile

    others = [
        p
        for p in glob.glob(os.path.join(source_dir, "*.parquet"))
        if not p.endswith(os.sep + "events.parquet")
    ]
    if others and os.path.exists(os.path.join(source_dir, "events.parquet")):
        from ..sources.tables import isolate_events_files

        source_dir = isolate_events_files(source_dir)

    from ..sources.tables import stream_events

    events = stream_events(spark, source_dir, max_files_per_trigger)
    out = per_event_features(events, windows)
    ckpt = tempfile.mkdtemp(prefix="ckpt_per_event_")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
