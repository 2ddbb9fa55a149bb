"""Ensemble + PCA anomaly operators: voting identity, out-of-fold
stacking determinism, PCA reconstruction-error properties."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frame(spark):
    # separable-ish: label correlates with x1
    rows = [
        (i, float(i % 50) + (10.0 if i % 3 == 0 else 0.0), float((i * 7) % 13),
         float((i * 11) % 17), i % 3 == 0)
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "user_id long, x1 double, x2 double, x3 double, label boolean"
    ).cache()


def test_voting_is_mean_of_bases(frame):
    from aml_feature_store_spark.operators.ensemble import train_voting

    out = train_voting(frame, ["x1", "x2", "x3"], "label").collect()
    assert len(out) == 300
    for r in out:
        mean = (r["p_lr"] + r["p_gbt"] + r["p_rf"]) / 3.0
        assert r["p_voting"] == pytest.approx(mean, abs=1e-12)
        assert 0.0 <= r["p_voting"] <= 1.0


def test_stacking_out_of_fold_and_deterministic(frame):
    from aml_feature_store_spark.operators.ensemble import train_stacking

    _, scores = train_stacking(frame, ["x1", "x2", "x3"], "label", n_folds=3)
    rows = scores.collect()
    assert len(rows) == 300
    # fold assignment is the deterministic hash — recompute and compare
    expected = {
        r["user_id"]: r["fold"]
        for r in frame.select(
            "user_id",
            F.pmod(F.xxhash64(F.col("user_id")), F.lit(3)).alias("fold"),
        ).collect()
    }
    for r in rows:
        assert r["fold"] == expected[r["user_id"]]
        assert 0.0 <= r["p_stacking"] <= 1.0
    # rerun produces identical scores (seeded learners + hash folds)
    _, scores2 = train_stacking(frame, ["x1", "x2", "x3"], "label", n_folds=3)
    a = {r["user_id"]: r["p_stacking"] for r in rows}
    b = {r["user_id"]: r["p_stacking"] for r in scores2.collect()}
    assert a == b


def test_pca_anomaly_matches_numpy_and_k_full_is_zero(frame):
    from aml_feature_store_spark.operators.ensemble import pca_anomaly_scores

    got = {
        r["user_id"]: r["reconstruction_error"]
        for r in pca_anomaly_scores(frame, ["x1", "x2", "x3"], k=2).collect()
    }
    pdf = frame.orderBy("user_id").toPandas()
    x = pdf[["x1", "x2", "x3"]].to_numpy(np.float64)
    mean = x.mean(axis=0)
    std = x.std(axis=0, ddof=1)
    std[std == 0.0] = 1.0
    xc = (x - mean) / std
    # principal subspace from numpy SVD; reconstruction error is rotation/
    # sign invariant, so it must agree with MLlib's eigendecomposition
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    v2 = vt[:2].T
    resid = xc - (xc @ v2) @ v2.T
    want = (resid * resid).sum(axis=1)
    for uid, w in zip(pdf["user_id"], want):
        assert got[uid] == pytest.approx(w, abs=1e-6)
    # k = d -> the subspace is the whole space -> zero error
    full = pca_anomaly_scores(frame, ["x1", "x2", "x3"], k=3).collect()
    assert all(r["reconstruction_error"] == pytest.approx(0.0, abs=1e-9) for r in full)
