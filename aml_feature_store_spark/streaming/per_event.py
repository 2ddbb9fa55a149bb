"""Per-event trailing-window features over a stream (SURVEY §2.9 T3/T4/T5).

The reference's core streaming semantic: on EVERY event, emit that
entity's full feature vector over multiple trailing windows (reference:
flink_job/aml_stream_processor.py:64-201 ListState; flink_job/
real_time_processor.py:78-230 MapState). Spark has no built-in operator
for this — sliding windows emit per-window, not per-event — so this is a
custom stateful processor on ``applyInPandasWithState``.

Keying strategy (the 100 TB design point): state is keyed by a HASH
BUCKET of the entity, not the raw entity. Python stateful processors pay
a fixed per-group cost every micro-batch (pandas frame assembly, Arrow
round-trip, state (de)serialization); with billions of entities that
fixed cost dominates. Bucketing amortizes it: one group handles ~|keys|/B
entities, and ALL per-entity window math inside a bucket is vectorized in
one numpy pass using a composite ``entity_idx * 2^34 + (ts − base)`` sort
key — per-entity trailing frames never cross the composite boundary, so
a single ``searchsorted`` + prefix-sum + sparse-table range-min/max over
the bucket's concatenated buffer evaluates every entity at once. No
per-entity Python loop anywhere.

Semantics (unchanged from the per-entity version, and oracle-checked):
- keyed state = per-entity event buffers (ts_ms, value) within the
  largest window (the ListState equivalent, manual event-time eviction);
- per micro-batch: merge batch rows into the buffers in event-time
  order, emit one output row per input event with all window aggregates;
- events sharing (entity, ts) are peers — each sees the others — exactly
  the batch RANGE-frame semantics, so stream output ≡ batch window
  output when per-key arrival respects event-time order (the
  online/offline consistency property the reference only simulates,
  README.md:163).

Scale notes: state per bucket is bounded by (max window × per-entity
rate × entities/bucket); bucket count is the parallelism knob — raise it
so buckets fit executor memory. Arrow-batched transfer; compute is
O(buffer log buffer) per bucket per batch, all in numpy.
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
DEFAULT_BUCKETS = int(os.environ.get("SPARK_GRAFT_STATE_BUCKETS", "256"))

# composite key = user_idx * 2^34 + (ts_ms − base): 2^34 ms ≈ 199 days of
# in-state span per entity (state only spans the largest window, so the
# margin is enormous), and 2^63 / 2^34 ≈ 5.4e8 entities per bucket.
_TS_BITS = 34
_TS_SPAN = np.int64(1) << _TS_BITS

# buffers are stored as raw little-endian byte blobs, not ARRAY<...>:
# state round-trips happen every micro-batch for every bucket, and
# numpy.tobytes()/frombuffer is a memcpy while array-typed state converts
# element-by-element through Python objects
STATE_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.BinaryType()),   # per-entity ids (sorted)
        T.StructField("cnt", T.BinaryType()),   # rows per entity
        T.StructField("ms", T.BinaryType()),    # concatenated event times
        T.StructField("val", T.BinaryType()),   # concatenated amounts
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


def _range_extrema(val: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Vectorized range-max/min of val over [lo, hi) slices via a sparse
    table (RMQ): O(n log n) build, O(levels) batched query — replaces the
    per-row Python slice loop. Requires hi > lo (trailing frames always
    contain the current event)."""
    n = len(val)
    stmax, stmin = [val], [val]
    j = 1
    while (1 << j) <= n:
        step = 1 << (j - 1)
        stmax.append(np.maximum(stmax[-1][:-step], stmax[-1][step:]))
        stmin.append(np.minimum(stmin[-1][:-step], stmin[-1][step:]))
        j += 1
    width = hi - lo
    # floor(log2(width)) via float exponent — exact for width < 2^52
    k = (np.frexp(width.astype(np.float64))[1] - 1).astype(np.int64)
    mx = np.empty(len(lo), dtype=val.dtype)
    mn = np.empty(len(lo), dtype=val.dtype)
    for level in range(int(k.max()) + 1 if len(k) else 0):
        m = k == level
        if not m.any():
            continue
        span = 1 << level
        l, h = lo[m], hi[m]
        mx[m] = np.maximum(stmax[level][l], stmax[level][h - span])
        mn[m] = np.minimum(stmin[level][l], stmin[level][h - span])
    return mx, mn


def _processor(windows: dict[str, int]):
    max_w_ms = max(windows.values()) * 1000
    out_cols = [f.name for f in output_schema(windows)]

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            uid_raw, cnt_raw, ms_raw, val_raw = state.get
            s_uid = np.frombuffer(uid_raw, dtype="<i8")
            s_cnt = np.frombuffer(cnt_raw, dtype="<i8")
            s_ms = np.frombuffer(ms_raw, dtype="<i8")
            s_val = np.frombuffer(val_raw, dtype="<f8")
            s_row_uid = np.repeat(s_uid, s_cnt)
        else:
            s_row_uid = np.empty(0, dtype=np.int64)
            s_ms = np.empty(0, dtype=np.int64)
            s_val = np.empty(0, dtype=np.float64)

        chunks = list(pdfs)
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        if batch[["ts_ms", "event_id"]].isna().any().any():
            batch = batch.dropna(subset=["ts_ms", "event_id"])
        b_uid = batch["user_id"].to_numpy(np.int64)
        b_ms = batch["ts_ms"].to_numpy(np.int64)
        b_val = batch["value"].to_numpy(np.float64)
        b_eid = batch["event_id"].to_numpy(np.int64)
        # batch rows in (entity, event-time, id) order
        b_order = np.lexsort((b_eid, b_ms, b_uid))
        b_uid, b_ms, b_val, b_eid = (
            b_uid[b_order], b_ms[b_order], b_val[b_order], b_eid[b_order]
        )

        # merge state + batch rows into one (entity, ts)-sorted buffer
        all_uid = np.concatenate([s_row_uid, b_uid])
        all_ms = np.concatenate([s_ms, b_ms])
        all_val = np.concatenate([s_val, b_val])
        universe = np.unique(all_uid)
        uidx = np.searchsorted(universe, all_uid)
        base = all_ms.min() if len(all_ms) else np.int64(0)
        span = int(all_ms.max() - base) if len(all_ms) else 0
        if span + max_w_ms >= int(_TS_SPAN):
            # composite-key isolation requires (data span + window) < 2^34 ms
            # (~199 days); bound the span per micro-batch instead
            raise ValueError(
                f"per-bucket event-time span {span} ms + window {max_w_ms} ms "
                f"exceeds the composite-key segment width 2^{_TS_BITS} ms; "
                "set maxFilesPerTrigger to bound the batch span"
            )
        comp = uidx.astype(np.int64) * _TS_SPAN + (all_ms - base)
        order = np.argsort(comp, kind="stable")
        comp, all_uid, all_ms, all_val = (
            comp[order], all_uid[order], all_ms[order], all_val[order]
        )

        # accumulate in integer cents: running sums are exact at any key
        # volume, and dividing once by 100.0 lands on the same double as
        # the batch plan's DECIMAL(25,2)->DOUBLE route. The round-trip
        # check enforces the 2-decimal amount contract loudly — a finer-
        # precision amount would otherwise silently diverge stream/batch.
        cents = np.round(all_val * 100.0)
        if not np.array_equal(cents / 100.0, all_val):
            bad = all_val[cents / 100.0 != all_val][:3]
            raise ValueError(
                "per-event window state requires amounts with <= 2 decimal "
                f"places (got e.g. {bad.tolist()}); widen the cents scale "
                "or pre-round the amount column explicitly"
            )
        csum = np.concatenate([[0], np.cumsum(cents.astype(np.int64))])

        # every batch event's frames against the merged buffer, all
        # entities at once: the composite key confines each frame to its
        # entity's segment (window width << 2^34 ms)
        b_uidx = np.searchsorted(universe, b_uid)
        b_comp = b_uidx.astype(np.int64) * _TS_SPAN + (b_ms - base)
        hi = np.searchsorted(comp, b_comp, side="right")
        cols: dict[str, Any] = {
            "user_id": b_uid,
            "event_id": b_eid,
            "ts_ms": b_ms,
        }
        for wname, wsecs in windows.items():
            lo = np.searchsorted(comp, b_comp - wsecs * 1000, side="left")
            n = hi - lo
            s = (csum[hi] - csum[lo]) / 100.0
            mx, mn = _range_extrema(all_val, lo, hi)
            cols[f"txn_count_{wname}"] = n
            cols[f"txn_amount_sum_{wname}"] = s
            cols[f"avg_txn_amount_{wname}"] = s / n  # frames are non-empty
            cols[f"max_txn_amount_{wname}"] = mx
            cols[f"min_txn_amount_{wname}"] = mn
        out_df = pd.DataFrame(cols)

        # evict per-entity state older than the largest window behind that
        # entity's max event-time (segment ends = exclusive prefix bounds)
        seg_end = np.searchsorted(
            comp, (np.arange(len(universe), dtype=np.int64) + 1) * _TS_SPAN,
            side="left",
        )
        last_ms = all_ms[seg_end - 1]  # per-entity max (segments non-empty)
        cutoff = np.repeat(last_ms - max_w_ms, np.diff(np.concatenate([[0], seg_end])))
        keep = all_ms >= cutoff
        k_uid, k_ms, k_val = all_uid[keep], all_ms[keep], all_val[keep]
        n_uid, n_cnt = np.unique(k_uid, return_counts=True)
        state.update(
            (
                np.ascontiguousarray(n_uid, dtype="<i8").tobytes(),
                np.ascontiguousarray(n_cnt, dtype="<i8").tobytes(),
                np.ascontiguousarray(k_ms, dtype="<i8").tobytes(),
                np.ascontiguousarray(k_val, dtype="<f8").tobytes(),
            )
        )
        yield out_df[out_cols]

    return fn


def per_event_features(
    stream: DataFrame,
    windows: dict[str, int] | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Apply the per-event stateful processor to a streaming DataFrame with
    columns (user_id, event_id, ts, value). Returns the streaming output."""
    windows = windows or DEFAULT_WINDOWS
    n_buckets = n_buckets or DEFAULT_BUCKETS
    prepared = stream.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        "value",
        F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).alias("_bucket"),
    )
    return prepared.groupBy("_bucket").applyInPandasWithState(
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
    # parquet sink, not memory: the memory sink collects every output row
    # into the DRIVER — fine at test scale, the dominant cost at 1M rows
    # and a non-starter on a cluster. Executors write in parallel; the
    # bounded result reads back as a plain DataFrame.
    dst = tempfile.mkdtemp(prefix="out_per_event_")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(output_schema(windows)).parquet(dst)
