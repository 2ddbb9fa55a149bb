"""Property test: point-in-time join ≡ the reference's per-row loop
(SURVEY §5.3; loop semantics from advanced_features.py:403-419)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from aml_feature_store_spark.operators.pit import (
    latest_snapshot,
    point_in_time_features,
)

T0 = dt.datetime(2024, 1, 1)


def _loop_oracle(events_pd: pd.DataFrame, spine_pd: pd.DataFrame, window_s: int):
    """The reference's semantics: per spine row, filter + aggregate."""
    out = []
    for _, s in spine_pd.iterrows():
        lo = s["ts"] - dt.timedelta(seconds=window_s)
        m = events_pd[
            (events_pd["user_id"] == s["user_id"])
            & (events_pd["ts"] >= lo)
            & (events_pd["ts"] <= s["ts"])
        ]
        out.append(
            {
                "event_id": s["event_id"],
                "count": len(m),
                "sum": round(float(m["value"].sum()), 2) if len(m) else 0.0,
                "max": float(m["value"].max()) if len(m) else None,
            }
        )
    return {r["event_id"]: r for r in out}


@pytest.mark.parametrize("seed", [7, 42])
def test_pit_matches_loop_oracle(spark, seed):
    rng = random.Random(seed)
    events = [
        (
            i,
            T0 + dt.timedelta(seconds=rng.randrange(0, 7 * 86400)),
            rng.randrange(0, 5),
            round(rng.uniform(1, 500), 2),
        )
        for i in range(300)
    ]
    # spine: 60 random (entity, t) points, some at event timestamps, some not
    spine = [
        (
            1000 + j,
            T0 + dt.timedelta(seconds=rng.randrange(0, 7 * 86400)),
            rng.randrange(0, 5),
        )
        for j in range(60)
    ] + [(2000 + i, ts, u) for i, (eid, ts, u, v) in enumerate(events[:20])]

    edf = spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long, value double"
    )
    sdf = spark.createDataFrame(spine, "event_id long, ts timestamp, user_id long")

    got = {
        r["event_id"]: r
        for r in point_in_time_features(
            sdf, edf, window_s=86400, suffix="24h"
        ).collect()
    }
    events_pd = pd.DataFrame(events, columns=["event_id", "ts", "user_id", "value"])
    spine_pd = pd.DataFrame(spine, columns=["event_id", "ts", "user_id"])
    want = _loop_oracle(events_pd, spine_pd, 86400)

    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["pit_count_24h"] == w["count"], k
        assert g["pit_sum_24h"] == pytest.approx(w["sum"], abs=1e-6), k
        if w["max"] is None:
            assert g["pit_max_24h"] is None
        else:
            assert g["pit_max_24h"] == pytest.approx(w["max"]), k


def test_empty_frame_defaults(spark):
    edf = spark.createDataFrame(
        [(0, T0, 1, 50.0)], "event_id long, ts timestamp, user_id long, value double"
    )
    # spine for a different user and for a time far before the event
    sdf = spark.createDataFrame(
        [(10, T0, 2), (11, T0 - dt.timedelta(days=2), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    out = {
        r["event_id"]: r
        for r in point_in_time_features(sdf, edf, window_s=3600).collect()
    }
    for k in (10, 11):
        assert out[k]["pit_count_24h"] == 0
        assert out[k]["pit_sum_24h"] == 0.0
        assert out[k]["pit_avg_24h"] == 0.0
        assert out[k]["pit_max_24h"] is None


def test_latest_snapshot(spark):
    df = spark.createDataFrame(
        [
            (0, T0, 1, 1.0),
            (1, T0 + dt.timedelta(hours=1), 1, 2.0),
            (2, T0, 2, 3.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    out = {r["user_id"]: r for r in latest_snapshot(df).collect()}
    assert out[1]["event_id"] == 1 and out[2]["event_id"] == 2


def test_pit_scalable_strategy_bit_identical(spark):
    """The O(rows) reader/probe strategy must reproduce the window
    strategy bit-for-bit, including empty frames and tie timestamps."""
    from aml_feature_store_spark.operators.pit import (
        point_in_time_features_scalable,
    )
    from aml_feature_store_spark.sources import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    spine = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    a = {r["event_id"]: r for r in point_in_time_features(
        spine, events, window_s=86400, suffix="24h").collect()}
    b = {r["event_id"]: r for r in point_in_time_features_scalable(
        spine, events, window_s=86400, suffix="24h").collect()}
    assert set(a) == set(b) and len(a) > 0
    cols = ["user_id", "spine_ts_ms", "pit_count_24h", "pit_sum_24h",
            "pit_avg_24h", "pit_max_24h", "pit_min_24h"]
    for eid, ra in a.items():
        for c in cols:
            assert ra[c] == b[eid][c], (eid, c, ra[c], b[eid][c])


def test_pit_scalable_empty_frames_and_no_events_entity(spark):
    import datetime as dt

    from aml_feature_store_spark.operators.pit import (
        point_in_time_features_scalable,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    edf = spark.createDataFrame(
        [(1, t0, 10.0)], "user_id long, ts timestamp, value double"
    )
    sdf = spark.createDataFrame(
        [(100, 1, t0 + dt.timedelta(hours=30)),   # frame empty (too late)
         (101, 2, t0)],                            # entity with no events
        "event_id long, user_id long, ts timestamp",
    )
    got = {r["event_id"]: r for r in point_in_time_features_scalable(
        sdf, edf, window_s=3600, suffix="1h").collect()}
    for eid in (100, 101):
        r = got[eid]
        assert r["pit_count_1h"] == 0
        assert r["pit_sum_1h"] == 0.0 and r["pit_avg_1h"] == 0.0
        assert r["pit_max_1h"] is None and r["pit_min_1h"] is None
