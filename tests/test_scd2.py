"""SCD2 history maintenance + as-of reads."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aml_feature_store_spark.operators.scd import scd2_apply, scd2_as_of

T0 = dt.datetime(2024, 1, 1)


def _ms(d: dt.datetime) -> int:
    return int(d.timestamp() * 1000)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id long, risk_tier string, ts timestamp"
    )


def test_scd2_versions_and_as_of(spark):
    h1 = scd2_apply(
        None,
        _changes(spark, [(1, "LOW", T0), (2, "HIGH", T0)]),
        "customer_id",
        ["risk_tier"],
    )
    # batch 2: customer 1 changes tier, customer 3 appears, 2 unchanged
    t1 = T0 + dt.timedelta(days=5)
    h2 = scd2_apply(
        h1,
        _changes(spark, [(1, "HIGH", t1), (2, "HIGH", t1), (3, "LOW", t1)]),
        "customer_id",
        ["risk_tier"],
    )
    rows = h2.orderBy("customer_id", "valid_from_ms").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["customer_id"], []).append(r)
    # customer 1: two versions, first closed at t1
    assert len(by_key[1]) == 2
    assert by_key[1][0]["risk_tier"] == "LOW"
    assert by_key[1][0]["valid_to_ms"] == _ms(t1)
    assert by_key[1][1]["risk_tier"] == "HIGH"
    assert by_key[1][1]["valid_to_ms"] is None
    # customer 2: unchanged → single open row
    assert len(by_key[2]) == 1 and by_key[2][0]["valid_to_ms"] is None
    # customer 3: new
    assert by_key[3][0]["valid_from_ms"] == _ms(t1)

    # as-of reads: before t1 → LOW; after → HIGH
    before = {
        r["customer_id"]: r["risk_tier"]
        for r in scd2_as_of(h2, _ms(T0 + dt.timedelta(days=1))).collect()
    }
    assert before == {1: "LOW", 2: "HIGH"}
    after = {
        r["customer_id"]: r["risk_tier"]
        for r in scd2_as_of(h2, _ms(t1 + dt.timedelta(days=1))).collect()
    }
    assert after == {1: "HIGH", 2: "HIGH", 3: "LOW"}


def test_scd2_intra_batch_collapses_to_latest(spark):
    t1 = T0 + dt.timedelta(hours=1)
    h = scd2_apply(
        None,
        _changes(spark, [(1, "LOW", T0), (1, "HIGH", t1)]),
        "customer_id",
        ["risk_tier"],
    )
    rows = h.collect()
    assert len(rows) == 1 and rows[0]["risk_tier"] == "HIGH"


def test_scd2_null_attr_transitions(spark):
    h1 = scd2_apply(
        None, _changes(spark, [(1, None, T0)]), "customer_id", ["risk_tier"]
    )
    t1 = T0 + dt.timedelta(days=1)
    h2 = scd2_apply(
        h1, _changes(spark, [(1, "LOW", t1)]), "customer_id", ["risk_tier"]
    )
    cur = h2.filter(F.col("valid_to_ms").isNull()).collect()
    assert len(cur) == 1 and cur[0]["risk_tier"] == "LOW"
    assert h2.count() == 2  # null→LOW is a real change (eqNullSafe)
