"""Feedback store (S8): DDL-free typed tables, filtered reads, the
retrain-decision aggregate."""

from __future__ import annotations

import datetime as dt

import pytest

from aml_feature_store_spark.feedback import FeedbackStore

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _rows(n, start=T0, correct_every=2):
    return [
        {
            "transaction_id": f"t{i}",
            "customer_id": f"CUST_{i:06d}",
            "predicted_score": 0.7,
            "predicted_label": 1,
            "actual_label": 1 if i % correct_every == 0 else 0,
            "analyst_id": "a1",
            "feedback_timestamp": start + dt.timedelta(days=i),
            "confidence_level": 4,
            "comments": "",
            "investigation_outcome": "closed",
        }
        for i in range(n)
    ]


def test_insert_read_filter(spark, tmp_path):
    store = FeedbackStore(spark, str(tmp_path / "fb"))
    store.insert("feedback", _rows(6))
    assert store.read("feedback").count() == 6
    since = T0 + dt.timedelta(days=3)
    assert store.read("feedback", since=since).count() == 3
    # empty table reads as empty typed frame, not an error
    assert store.read("model_performance").count() == 0


def test_recent_accuracy_window(spark, tmp_path):
    store = FeedbackStore(spark, str(tmp_path / "fb2"))
    store.insert("feedback", _rows(10))
    r = store.recent_accuracy(days=3).collect()[0]
    # last 4 days of rows: i in {6..9} (cutoff inclusive of day 6)
    assert r["n_feedback"] == 4
    assert r["accuracy"] == pytest.approx(0.5)


def test_model_performance_roundtrip(spark, tmp_path):
    store = FeedbackStore(spark, str(tmp_path / "fb3"))
    store.insert(
        "model_performance",
        [
            {
                "model_version": "v1",
                "training_timestamp": T0,
                "validation_auc": 0.93,
                "test_auc": 0.91,
                "precision": 0.8,
                "recall": 0.7,
                "f1_score": 0.746,
                "feature_count": 90,
                "training_samples": 50_000,
                "is_active": True,
            }
        ],
    )
    row = store.read("model_performance").collect()[0]
    assert row["model_version"] == "v1" and row["is_active"]
    with pytest.raises(KeyError):
        store.read("nope")
