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


def test_generate_documents_deterministic_with_planted_dups(spark):
    """LLM scale generator (VERDICT r4 #7): deterministic per (seed, n),
    testdata-shaped columns, and the planted near-dup structure is
    detectable (every 10th doc is a one-word mutation of doc id-9)."""
    from aml_feature_store_spark.sources.generator import generate_documents

    a = generate_documents(spark, n=200).collect()
    b = generate_documents(spark, n=200).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    rows = {r["doc_id"]: r for r in a}
    assert all(r["n_chars"] == len(r["text"]) for r in a)
    # planted near-dup: id 19 is id 10's text plus " extra"
    assert rows[19]["text"] == rows[10]["text"] + " extra"
    assert rows[9]["text"].endswith(" extra") is False  # id 9 < near_dup_every
    wl = {w for r in a for w in r["text"].split()}
    assert len(wl) <= 41  # vocab + "extra"


def test_generate_embeddings_deterministic_and_clustered(spark):
    from aml_feature_store_spark.sources.generator import generate_embeddings
    import numpy as np

    a = generate_embeddings(spark, n=300, dim=16, n_clusters=4).collect()
    b = generate_embeddings(spark, n=300, dim=16, n_clusters=4).collect()
    assert [(r["vec_id"], r["label"], r["embedding"]) for r in a] == [
        (r["vec_id"], r["label"], r["embedding"]) for r in b
    ]
    assert {r["label"] for r in a} == {0, 1, 2, 3}
    assert all(len(r["embedding"]) == 16 for r in a)
    # same-label vectors are closer to their centroid than cross-label
    by_label = {}
    for r in a:
        by_label.setdefault(r["label"], []).append(np.array(r["embedding"]))
    cents = {l: np.mean(v, axis=0) for l, v in by_label.items()}
    for l, vecs in by_label.items():
        own = float(np.mean([np.linalg.norm(v - cents[l]) for v in vecs]))
        other = min(
            float(np.mean([np.linalg.norm(v - cents[m]) for v in vecs]))
            for m in cents if m != l
        )
        assert own < other
