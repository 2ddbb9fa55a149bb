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


def _trailing_features_columns(df, spec):
    """The pre-r12 Column-by-Column spelling of trailing_features, kept
    as the bit-equality reference for the batched selectExpr spelling
    (the rewrite is a plan-BUILD optimization; values must not move)."""
    from pyspark.sql import Window
    from aml_feature_store_spark.operators.windows import DEC, DEC4, _ms

    out = df.withColumn("_ts_ms", _ms(spec.ts_col))
    amt_dec = F.col(spec.amount_col).cast(DEC)
    amt_sq_dec = (F.col(spec.amount_col) * F.col(spec.amount_col)).cast(DEC4)
    base = Window.partitionBy(spec.entity_col).orderBy(F.col("_ts_ms"))
    for wname, wsecs in spec.windows.items():
        w = base.rangeBetween(-wsecs * 1000, 0)
        n = F.count(F.lit(1)).over(w)
        s = F.sum(amt_dec).over(w).cast("double")
        s2 = F.sum(amt_sq_dec).over(w).cast("double")
        mean = s / n
        var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
        cols = {
            f"txn_count_{wname}": n,
            f"txn_amount_sum_{wname}": s,
            f"avg_txn_amount_{wname}": mean,
            f"max_txn_amount_{wname}": F.max(spec.amount_col).over(w),
            f"min_txn_amount_{wname}": F.min(spec.amount_col).over(w),
            f"std_txn_amount_{wname}": F.round(F.sqrt(var), 6),
            f"velocity_score_{wname}": n.cast("double")
            / F.lit(wsecs / spec.velocity_unit_s),
        }
        for dcol in spec.distinct_cols:
            if spec.distinct_exact:
                dexpr = F.size(F.collect_set(dcol).over(w)).cast("long")
            else:
                dexpr = F.approx_count_distinct(dcol, 0.02).over(w)
            cols[f"unique_{dcol}_{wname}"] = dexpr
        out = out.withColumns(cols)
    return out.drop("_ts_ms")


def test_selectexpr_spelling_equals_column_spelling(spark):
    """The r12 batched-selectExpr build must be bit-equal (values, names,
    dtypes, row multiplicity) to the Column spelling across all six
    windows, exact and approximate distincts, and awkward values
    (zero-variance frames, negative amounts, timestamp ties)."""
    rows = [
        (0, 1, 10.0), (30, 1, 10.0), (30, 1, -3.25), (3601, 1, 40.0),
        (90000, 1, 7.5), (0, 2, 0.01), (59, 2, 0.01), (86460, 2, 100.0),
    ]
    df = _mk(spark, rows).withColumn(
        "event_type", (F.col("event_id") % 3).cast("string")
    )
    for exact in (True, False):
        spec = TrailingWindowSpec(
            distinct_cols=("event_type",), distinct_exact=exact
        )
        new = trailing_features(df, spec)
        ref = _trailing_features_columns(df, spec)
        assert new.schema == ref.schema
        assert sorted(map(tuple, new.collect())) == sorted(
            map(tuple, ref.collect())
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


def test_negative_epoch_ms_bucketized_bit_identical(spark):
    """Pre-1970 timestamps (negative epoch-ms): the driver-side carry
    fold must bucket edge positions with the plan's `div` semantics
    (truncation toward zero), not Python floor division — a mismatch
    silently drops an extrema carry at a bucket edge."""
    import datetime as dt
    import random

    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        hot_entity_cuts,
        trailing_features,
        trailing_features_scalable,
    )

    t0 = dt.datetime(1969, 6, 1)  # epoch-ms ≈ -18.5e9
    random.seed(11)
    rows = [
        (
            i,
            t0 + dt.timedelta(seconds=random.randint(0, 5 * 86400)),
            1 + (i % 2),
            float(random.randint(1, 100)),
        )
        for i in range(800)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    spec = TrailingWindowSpec(windows={"1h": 3600, "24h": 86400})
    hb = hot_entity_cuts(df, "user_id", "ts", 86400, min_rows=1, buckets=5,
                         cap=10)
    assert hb is not None and all(lo < 0 for lo, _ in hb.ents.values())
    cols = ["event_id"] + [
        f"{m}_{w}"
        for w in spec.windows
        for m in ("txn_count", "txn_amount_sum", "max_txn_amount",
                  "min_txn_amount", "std_txn_amount")
    ]
    a = {r["event_id"]: r for r in
         trailing_features(df, spec).select(*cols).collect()}
    b = {r["event_id"]: r for r in
         trailing_features_scalable(df, spec, hot_buckets=hb)
         .select(*cols).collect()}
    assert set(a) == set(b) and len(a) == 800
    for eid, ra in a.items():
        for c in cols:
            assert ra[c] == b[eid][c], (eid, c, ra[c], b[eid][c])


def test_decimal_amount_scalable_preserves_type_and_values(spark):
    """A decimal amount column must ride the scalable plans (bucketized
    and not) without coercing extrema to double — same type and values
    as the WindowExec plan."""
    import datetime as dt
    import random
    from decimal import Decimal

    from aml_feature_store_spark.operators.windows import (
        TrailingWindowSpec,
        hot_entity_cuts,
        trailing_features,
        trailing_features_scalable,
    )

    t0 = dt.datetime(2024, 3, 1)
    random.seed(13)
    rows = [
        (
            i,
            t0 + dt.timedelta(seconds=random.randint(0, 2 * 86400)),
            1 + (i % 3),
            Decimal(random.randint(100, 99999)) / 100,
        )
        for i in range(600)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value decimal(10,2)"
    )
    spec = TrailingWindowSpec(windows={"1h": 3600, "24h": 86400})
    cols = ["event_id"] + [
        f"{m}_{w}"
        for w in spec.windows
        for m in ("txn_count", "txn_amount_sum", "max_txn_amount",
                  "min_txn_amount", "std_txn_amount")
    ]
    ref = trailing_features(df, spec).select(*cols)
    plain = trailing_features_scalable(df, spec).select(*cols)
    hb = hot_entity_cuts(df, "user_id", "ts", 86400, min_rows=1, buckets=4,
                         cap=10)
    bucketed = trailing_features_scalable(df, spec, hot_buckets=hb).select(*cols)
    assert dict(ref.dtypes)["max_txn_amount_1h"] == "decimal(10,2)"
    assert dict(plain.dtypes)["max_txn_amount_1h"] == "decimal(10,2)"
    assert dict(bucketed.dtypes)["max_txn_amount_1h"] == "decimal(10,2)"
    a = {r["event_id"]: r for r in ref.collect()}
    for out in (plain, bucketed):
        b = {r["event_id"]: r for r in out.collect()}
        assert set(a) == set(b) and len(a) == 600
        for eid, ra in a.items():
            for c in cols:
                assert ra[c] == b[eid][c], (eid, c, ra[c], b[eid][c])


def test_routing_stats_sample_agrees_with_full(spark):
    """The 1% row-sample stats pass (warehouse-scale path) must route a
    hot-key frame the same way as the full pass: same hot entity
    detected, density estimate on the same side of the threshold."""
    from pyspark.sql import functions as F

    from aml_feature_store_spark.operators.windows import (
        AUTO_FRAME_ROWS_THRESHOLD,
        estimate_frame_rows,
        hot_entity_cuts,
    )

    # one entity owns 60k dense rows (span 6h << 24h window); 400 cold
    # entities own 50 rows each across 30 days
    hot = spark.range(60_000).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 21600).alias("ts"),
        F.lit(1).alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    cold = spark.range(20_000).select(
        (F.col("id") + 100_000).alias("event_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 7919) % (30 * 86400)
        ).alias("ts"),
        (2 + F.col("id") % 400).alias("user_id"),
        F.lit(1.0).alias("value"),
    )
    df = hot.unionByName(cold)
    est_full = estimate_frame_rows(df, "user_id", "ts", 86400, sample=False)
    est_samp = estimate_frame_rows(df, "user_id", "ts", 86400, sample=True)
    assert (est_full > AUTO_FRAME_ROWS_THRESHOLD) == (
        est_samp > AUTO_FRAME_ROWS_THRESHOLD
    )
    assert est_samp == pytest.approx(est_full, rel=0.25)
    hb_full = hot_entity_cuts(df, "user_id", "ts", 86400, min_rows=30_000,
                              sample=False)
    hb_samp = hot_entity_cuts(df, "user_id", "ts", 86400, min_rows=30_000,
                              sample=True)
    assert hb_full is not None and hb_samp is not None
    assert set(hb_full.ents) == set(hb_samp.ents) == {1}
    # sampled cuts are a load-balancing plan over the same span (± pad)
    lo_f, w_f = hb_full.ents[1]
    lo_s, w_s = hb_samp.ents[1]
    assert abs(lo_s - lo_f) < 600_000 and abs(w_s - w_f) < 600_000


def test_stats_cache_invalidates_on_inplace_rewrite(spark, tmp_path):
    """Memoized routing stats key on (path, size, mtime): rewriting data
    at the SAME path must invalidate, not silently reuse stale stats."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aml_feature_store_spark.operators.windows import estimate_frame_rows

    path = str(tmp_path / "ev.parquet")

    def write(n_hot):
        tbl = pa.table(
            {
                "event_id": list(range(n_hot)),
                "ts": pa.array(
                    [1700000000_000_000 + (i % 3600) * 1_000_000 for i in range(n_hot)],
                    type=pa.timestamp("us", tz="UTC"),
                ),
                "user_id": [1] * n_hot,
                "value": [float(i) for i in range(n_hot)],
            }
        )
        pq.write_table(tbl, path)

    write(500)
    est1 = estimate_frame_rows(
        spark.read.parquet(path), "user_id", "ts", 86400
    )
    _time.sleep(0.01)  # ensure a distinct mtime_ns
    write(2000)
    est2 = estimate_frame_rows(
        spark.read.parquet(path), "user_id", "ts", 86400
    )
    assert est1 == pytest.approx(500.0) and est2 == pytest.approx(2000.0)


def test_plan_cache_bounds_and_jdiv():
    """FIFO cache bound + Spark-div arithmetic helpers (pure python)."""
    from aml_feature_store_spark.operators.windows import _cache_put, _jdiv

    c: dict = {}
    for i in range(40):
        _cache_put(c, i, i, 8)
    assert len(c) == 8 and 39 in c and 0 not in c
    # trunc-toward-zero vs floor: differs on negatives
    assert _jdiv(7, 2) == 3 and _jdiv(-7, 2) == -3 and (-7) // 2 == -4
    assert _jdiv(-86400001, 3600000) == -24
