"""Tests: synthetic generator determinism/shape, kafka transforms,
partitioned event-log sink, feature registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from aml_feature_store_spark import registry
from aml_feature_store_spark.sources.generator import (
    generate_transactions,
    write_event_log,
)
from aml_feature_store_spark.sources.kafka import (
    parse_kafka_value,
    to_kafka_records,
)


def test_generator_shape_and_determinism(spark):
    df = generate_transactions(spark, n=2000, seed=42)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("customer_id").alias("nc"),
        F.min("amount").alias("min_amt"),
        F.avg(F.col("is_suspicious").cast("int")).alias("susp"),
    ).collect()[0]
    assert agg["n"] == 2000
    assert agg["min_amt"] >= 1.0
    assert 0.02 < agg["susp"] < 0.10
    # deterministic per seed
    a = generate_transactions(spark, n=500, seed=7).agg(
        F.sum(F.col("amount").cast("decimal(25,2)"))
    ).collect()[0][0]
    b = generate_transactions(spark, n=500, seed=7).agg(
        F.sum(F.col("amount").cast("decimal(25,2)"))
    ).collect()[0][0]
    assert a == b
    c = generate_transactions(spark, n=500, seed=8).agg(
        F.sum(F.col("amount").cast("decimal(25,2)"))
    ).collect()[0][0]
    assert a != c


def test_generator_hot_keys(spark):
    df = generate_transactions(spark, n=20000, seed=42)
    hot = (
        df.filter(F.col("customer_id") <= "CUST_000100")
        .count()
    )
    # ~20% routed to hot pool + uniform share ≈ 0.2 + 0.8*0.1 = 0.28
    assert 0.2 < hot / 20000 < 0.4


def test_kafka_roundtrip(spark):
    df = generate_transactions(spark, n=50, seed=1).withColumns(
        {
            "processing_timestamp": F.col("event_timestamp"),
            "is_night_transaction": F.lit(False),
            "profile_risk_level": F.lit("NORMAL"),
        }
    )
    records = to_kafka_records(df, key_col="customer_id")
    assert records.columns == ["key", "value"]
    back = parse_kafka_value(records)
    assert back.count() == 50
    orig = {r["transaction_id"]: r["amount"] for r in df.collect()}
    got = {r["transaction_id"]: r["amount"] for r in back.collect()}
    assert got == orig


def test_event_log_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "log")
    df = generate_transactions(spark, n=2000, n_days=10, seed=42)
    write_event_log(df, path)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    one_day = back.filter(F.col("event_date") == "2024-01-03")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    # partition filter must prune, not scan-and-filter
    assert "PartitionFilters: [isnotnull(event_date" in plan
    assert one_day.count() > 0


def test_registry_views():
    names = registry.list_views()
    assert "customer_transaction_features" in names
    v = registry.get_view("customer_transaction_features")
    assert v.entity_col == "user_id" and v.ttl_s == 86400 and v.online
    assert "txn_amount_sum_1h" in v.features
