"""Per-event trailing-window features on the Spark 4
``transformWithStateInPandas`` API (SURVEY §2.9 T3/T4 — the modern
stateful-processing surface with typed state handles and TTL support).

Same semantics as streaming/per_event.py (the applyInPandasWithState
implementation): per input event, emit the entity's aggregates over each
trailing window, with the event buffer held in keyed ValueState and
evicted behind the largest window. The two implementations are
consistency-tested against each other and against the batch window SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .per_event import DEFAULT_WINDOWS, output_schema

STATE_SCHEMA = "ms array<long>, val array<double>"


class TrailingFeatureProcessor(StatefulProcessor):
    """Typed stateful processor: ValueState holds the (ts_ms, value)
    buffer; arithmetic identical to per_event._processor (vectorized
    searchsorted/cumsum over the merged buffer)."""

    def __init__(self, windows: dict[str, int]):
        self.windows = windows
        self.max_w_ms = max(windows.values()) * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.buffer = handle.getValueState("buffer", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self.buffer.exists():
            ms_buf, val_buf = self.buffer.get()
            ms_buf = np.asarray(ms_buf, dtype=np.int64)
            val_buf = np.asarray(val_buf, dtype=np.float64)
        else:
            ms_buf = np.empty(0, dtype=np.int64)
            val_buf = np.empty(0, dtype=np.float64)

        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.dropna(subset=["ts_ms", "event_id"]).sort_values(
            ["ts_ms", "event_id"], ignore_index=True
        )
        b_ms = batch["ts_ms"].to_numpy(np.int64)
        b_val = batch["value"].to_numpy(np.float64)

        order = np.argsort(np.concatenate([ms_buf, b_ms]), kind="stable")
        ms_buf = np.concatenate([ms_buf, b_ms])[order]
        val_buf = np.concatenate([val_buf, b_val])[order]
        # integer-cents accumulation + loud 2-decimal contract check
        # (same rationale as per_event.py)
        cents = np.round(val_buf * 100.0)
        if not np.array_equal(cents / 100.0, val_buf):
            bad = val_buf[cents / 100.0 != val_buf][:3]
            raise ValueError(
                "per-event window state requires amounts with <= 2 decimal "
                f"places (got e.g. {bad.tolist()})"
            )
        csum = np.concatenate([[0], np.cumsum(cents.astype(np.int64))])

        cols = {
            "user_id": np.full(len(batch), user_id, dtype=np.int64),
            "event_id": batch["event_id"].to_numpy(np.int64),
            "ts_ms": b_ms,
        }
        hi = np.searchsorted(ms_buf, b_ms, side="right")
        for wname, wsecs in self.windows.items():
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

        if len(ms_buf):
            keep = ms_buf >= ms_buf[-1] - self.max_w_ms
            ms_buf, val_buf = ms_buf[keep], val_buf[keep]
        self.buffer.update((ms_buf.tolist(), val_buf.tolist()))
        yield pd.DataFrame(cols)

    def close(self) -> None:
        pass


def per_event_features_tws(
    stream: DataFrame, windows: dict[str, int] | None = None
) -> DataFrame:
    """transformWithStateInPandas twin of per_event.per_event_features."""
    windows = windows or DEFAULT_WINDOWS
    prepared = stream.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        "value",
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        TrailingFeatureProcessor(windows),
        outputStructType=output_schema(windows),
        outputMode="append",
        timeMode="none",
    )
