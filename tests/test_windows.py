"""Unit tests for trailing-window features on hand-computed tiny frames."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from aml_feature_store_spark.operators.windows import (
    TrailingWindowSpec,
    trailing_features,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, v) for i, (s, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_trailing_counts_and_sums(spark):
    # user 1: events at t=0, 30s, 3601s. 1h window at the 3rd event must
    # include only events within [ts-3600s, ts] → itself + t=30s event.
    df = _mk(spark, [(0, 1, 10.0), (30, 1, 20.0), (3601, 1, 40.0)])
    spec = TrailingWindowSpec(windows={"1h": 3600})
    out = {
        r["event_id"]: r
        for r in trailing_features(df, spec).collect()
    }
    assert out[0]["txn_count_1h"] == 1
    assert out[1]["txn_count_1h"] == 2
    assert out[1]["txn_amount_sum_1h"] == 30.0
    assert out[2]["txn_count_1h"] == 2  # t=30s dropped (3601-3600 > 30? no: 1 <= 30 → kept)
    # window is inclusive [ts-W, ts]: at t=3601 cutoff is 1 → event at 30 kept
    assert out[2]["txn_amount_sum_1h"] == 60.0


def test_window_boundary_inclusive(spark):
    # event exactly W seconds earlier is INSIDE the frame (inclusive bound)
    df = _mk(spark, [(0, 1, 5.0), (3600, 1, 7.0)])
    spec = TrailingWindowSpec(windows={"1h": 3600})
    out = sorted(trailing_features(df, spec).collect(), key=lambda r: r["event_id"])
    assert out[1]["txn_count_1h"] == 2
    assert out[1]["txn_amount_sum_1h"] == 12.0


def test_users_partitioned_independently(spark):
    df = _mk(spark, [(0, 1, 5.0), (1, 2, 100.0), (2, 1, 5.0)])
    spec = TrailingWindowSpec(windows={"1m": 60})
    out = {r["event_id"]: r for r in trailing_features(df, spec).collect()}
    assert out[1]["txn_count_1m"] == 1
    assert out[2]["txn_count_1m"] == 2
    assert out[2]["txn_amount_sum_1m"] == 10.0


def test_std_and_velocity(spark):
    df = _mk(spark, [(0, 1, 10.0), (10, 1, 20.0)])
    spec = TrailingWindowSpec(windows={"1h": 3600})
    out = {r["event_id"]: r for r in trailing_features(df, spec).collect()}
    # population stddev of {10,20} = 5
    assert out[1]["std_txn_amount_1h"] == pytest.approx(5.0)
    assert out[0]["std_txn_amount_1h"] == 0.0
    # velocity = count per hour-equivalent window: 2 events / 1h
    assert out[1]["velocity_score_1h"] == pytest.approx(2.0)


def test_distinct_counts(spark):
    rows = [
        (0, 1, "a"),
        (10, 1, "b"),
        (20, 1, "a"),
        (4000, 1, "c"),
    ]
    df = spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, 1.0, m)
            for i, (s, u, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, value double, event_type string",
    )
    spec = TrailingWindowSpec(windows={"1h": 3600}, distinct_cols=("event_type",))
    out = {r["event_id"]: r for r in trailing_features(df, spec).collect()}
    assert out[2]["unique_event_type_1h"] == 2
    # cutoff at t=4000 is t=400 → events at 0/10/20 evicted; frame = {c}
    assert out[3]["unique_event_type_1h"] == 1


def test_distinct_counts_eviction(spark):
    rows = [(0, 1, "a"), (10, 1, "b"), (4000, 1, "c")]
    df = spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, 1.0, m)
            for i, (s, u, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, value double, event_type string",
    )
    spec = TrailingWindowSpec(windows={"1h": 3600}, distinct_cols=("event_type",))
    out = {r["event_id"]: r for r in trailing_features(df, spec).collect()}
    assert out[1]["unique_event_type_1h"] == 2
    assert out[2]["unique_event_type_1h"] == 1


def test_scalable_full_strategy_bit_identical(spark):
    """trailing_features_scalable must reproduce trailing_features
    bit-for-bit on every metric (the auto planner's correctness
    contract)."""
    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        trailing_features,
        trailing_features_scalable,
    )
    from aml_feature_store_spark.sources import load_table

    spec = TrailingWindowSpec(windows={"5m": 300, "1h": 3600, "24h": 86400})
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    cols = ["event_id"] + [
        f"{m}_{w}"
        for w in spec.windows
        for m in (
            "txn_count", "txn_amount_sum", "avg_txn_amount",
            "max_txn_amount", "min_txn_amount", "std_txn_amount",
            "velocity_score",
        )
    ]
    a = {r["event_id"]: r for r in trailing_features(df, spec).select(*cols).collect()}
    b = {r["event_id"]: r for r in trailing_features_scalable(df, spec).select(*cols).collect()}
    assert set(a) == set(b) and len(a) == 1000
    for eid, ra in a.items():
        rb = b[eid]
        for c in cols:
            assert ra[c] == rb[c], (eid, c, ra[c], rb[c])


def test_auto_strategy_picks_by_density(spark):
    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        trailing_features_auto,
    )
    from aml_feature_store_spark.sources import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    spec = TrailingWindowSpec(windows={"24h": 86400})
    # sf0.001: 1000 events / 150 users / 30d -> ~0.2 rows per 24h frame
    sparse = trailing_features_auto(df, spec)
    assert "_win" not in sparse.columns  # WindowExec path
    # force the dense path with a tiny threshold; results must still match
    dense = trailing_features_auto(df, spec, frame_rows_threshold=0)
    a = {r["event_id"]: r["txn_count_24h"] for r in sparse.collect()}
    b = {r["event_id"]: r["txn_count_24h"] for r in dense.collect()}
    assert a == b


def test_flag_counts_scalable_bit_identical(spark):
    """Cum+probe conditional counts == range-frame conditional sums."""
    from pyspark.sql import Window

    from aml_feature_store_spark.operators.windows import (
        trailing_flag_counts_scalable,
    )
    from aml_feature_store_spark.sources import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    night = (F.hour("ts") < 6) | (F.hour("ts") > 22)
    got = {
        r["event_id"]: r
        for r in trailing_flag_counts_scalable(
            df, {"night": night}, 86400
        ).collect()
    }
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts")))
        .rangeBetween(-86400000, 0)
    )
    want = {
        r["event_id"]: r
        for r in df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("cnt"),
            F.sum(F.when(night, 1).otherwise(0)).over(w).alias("night"),
        ).collect()
    }
    assert set(got) == set(want) and len(got) == 1000
    for eid, rw in want.items():
        assert (got[eid]["cnt"], got[eid]["night"]) == (rw["cnt"], rw["night"])


def test_bucketized_bit_identical(spark):
    """Hot-entity time-bucketization (literal carry stitching) must
    reproduce trailing_features bit-for-bit on every metric — forced on
    for EVERY entity with a tiny bucket count so cross-bucket carries,
    bucket-edge chunks, and empty buckets all exercise."""
    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        hot_entity_cuts,
        trailing_features,
        trailing_features_scalable,
    )
    from aml_feature_store_spark.sources import load_table

    spec = TrailingWindowSpec(windows={"5m": 300, "1h": 3600, "24h": 86400})
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    hb = hot_entity_cuts(df, "user_id", "ts", 86400, min_rows=1, buckets=4,
                         cap=1000)
    assert hb is not None and len(hb.ents) > 1
    cols = ["event_id"] + [
        f"{m}_{w}"
        for w in spec.windows
        for m in (
            "txn_count", "txn_amount_sum", "avg_txn_amount",
            "max_txn_amount", "min_txn_amount", "std_txn_amount",
            "velocity_score",
        )
    ]
    a = {r["event_id"]: r for r in
         trailing_features(df, spec).select(*cols).collect()}
    b = {r["event_id"]: r for r in
         trailing_features_scalable(df, spec, hot_buckets=hb)
         .select(*cols).collect()}
    assert set(a) == set(b) and len(a) == 1000
    for eid, ra in a.items():
        for c in cols:
            assert ra[c] == b[eid][c], (eid, c, ra[c], b[eid][c])


def test_bucketized_ties_and_markers(spark):
    """Bucketized equality on the adversarial shapes: (a) heavy
    timestamp ties around bucket edges (range-frame peers must never
    split); (b) exact windowed distincts (interval markers carry across
    buckets)."""
    import datetime as dt
    import random

    from aml_feature_store_spark.operators.windows import (
        HotBucketSpec,
        TrailingWindowSpec,
        hot_entity_cuts,
        trailing_features,
        trailing_features_scalable,
    )
    from aml_feature_store_spark.sources import load_table

    T0 = dt.datetime(2024, 1, 1)
    random.seed(7)
    rows = []
    for i in range(2000):
        s = random.choice([0, 100, 100, 3600, 3600, 3600, 7200, 86400,
                           86400, 90000, 90000, 180000])
        rows.append((i, T0 + dt.timedelta(seconds=s), 1,
                     float(random.choice([5, 10, 20]))))
    for i in range(2000, 2100):
        rows.append((i, T0 + dt.timedelta(seconds=random.randint(0, 180000)),
                     2, float(random.randint(1, 50))))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    spec = TrailingWindowSpec(windows={"5m": 300, "1h": 3600, "24h": 86400})
    # hand-pinned cuts so a tie group and a 24h chunk both straddle edges
    hb = HotBucketSpec(
        buckets=5,
        ents={1: (1704067200000 - 86400001, (180001000 + 2 * 86400002) // 5)},
    )
    cols = ["event_id"] + [
        f"{m}_{w}"
        for w in spec.windows
        for m in ("txn_count", "txn_amount_sum", "avg_txn_amount",
                  "max_txn_amount", "min_txn_amount", "std_txn_amount")
    ]
    a = {r["event_id"]: r for r in
         trailing_features(df, spec).select(*cols).collect()}
    b = {r["event_id"]: r for r in
         trailing_features_scalable(df, spec, hot_buckets=hb)
         .select(*cols).collect()}
    assert set(a) == set(b) and len(a) == 2100
    for eid, ra in a.items():
        for c in cols:
            assert ra[c] == b[eid][c], (eid, c, ra[c], b[eid][c])

    tdf = load_table(spark, "/root/testdata/sf0.001", "events")
    mspec = TrailingWindowSpec(
        entity_col="event_type",
        windows={"1h": 3600, "24h": 86400},
        distinct_cols=("user_id",),
    )
    mhb = hot_entity_cuts(tdf, "event_type", "ts", 86400, min_rows=1,
                          buckets=8, cap=100)
    mcols = ["event_id", "txn_count_1h", "unique_user_id_1h",
             "txn_count_24h", "unique_user_id_24h", "max_txn_amount_24h",
             "std_txn_amount_24h", "min_txn_amount_1h"]
    ma = {r["event_id"]: r for r in
          trailing_features(tdf, mspec).select(*mcols).collect()}
    mb = {r["event_id"]: r for r in
          trailing_features_scalable(tdf, mspec, hot_buckets=mhb)
          .select(*mcols).collect()}
    assert set(ma) == set(mb) and len(ma) == 1000
    for eid, ra in ma.items():
        for c in mcols:
            assert ra[c] == mb[eid][c], (eid, c, ra[c], mb[eid][c])


def test_sums_cumsum_bucketized_bit_identical(spark):
    """The cum+probe sums strategy with hot-entity bucketization must
    equal its unbucketized self (and thus the frame-based operator)."""
    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        hot_entity_cuts,
        trailing_sums_scalable,
    )
    from aml_feature_store_spark.sources import load_table

    spec = TrailingWindowSpec(windows={"5m": 300, "1h": 3600, "24h": 86400})
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    hb = hot_entity_cuts(df, "user_id", "ts", 86400, min_rows=1, buckets=4,
                         cap=1000)
    cols = ["event_id"] + [
        f"{m}_{w}"
        for w in spec.windows
        for m in ("txn_count", "txn_amount_sum", "avg_txn_amount",
                  "velocity_score")
    ]
    a = {r["event_id"]: r for r in
         trailing_sums_scalable(df, spec).select(*cols).collect()}
    b = {r["event_id"]: r for r in
         trailing_sums_scalable(df, spec, hot_buckets=hb)
         .select(*cols).collect()}
    assert set(a) == set(b) and len(a) == 1000
    for eid, ra in a.items():
        for c in cols:
            assert ra[c] == b[eid][c], (eid, c, ra[c], b[eid][c])


def test_auto_routes_hot_entities_to_buckets(spark):
    """trailing_features_auto engages bucketization below a forced hot
    threshold and the values stay identical to the WindowExec plan."""
    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        trailing_features,
        trailing_features_auto,
    )
    from aml_feature_store_spark.sources import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    spec = TrailingWindowSpec(windows={"24h": 86400})
    routed = trailing_features_auto(
        df, spec, frame_rows_threshold=0, hot_rows_threshold=1
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "element_at" in plan  # literal-carry stitch engaged
    a = {r["event_id"]: r["txn_count_24h"]
         for r in trailing_features(df, spec).collect()}
    b = {r["event_id"]: r["txn_count_24h"] for r in routed.collect()}
    assert a == b


def test_scalable_distinct_markers_bit_identical(spark):
    """Interval-marker exact distincts == collect_set frame distincts,
    across multiple windows and two distinct columns."""
    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        trailing_features,
        trailing_features_scalable,
    )
    from aml_feature_store_spark.sources import load_table

    spec = TrailingWindowSpec(
        entity_col="event_type",
        windows={"1h": 3600, "24h": 86400},
        distinct_cols=("user_id",),
    )
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    cols = ["event_id", "txn_count_1h", "unique_user_id_1h",
            "txn_count_24h", "unique_user_id_24h", "max_txn_amount_24h",
            "std_txn_amount_24h"]
    a = {r["event_id"]: r for r in
         trailing_features(df, spec).select(*cols).collect()}
    b = {r["event_id"]: r for r in
         trailing_features_scalable(df, spec).select(*cols).collect()}
    assert set(a) == set(b) and len(a) == 1000
    for eid, ra in a.items():
        for c in cols:
            assert ra[c] == b[eid][c], (eid, c, ra[c], b[eid][c])
