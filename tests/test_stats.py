"""Tiny hand-computed frames for the statistical aggregates (SURVEY §5.2)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from aml_feature_store_spark.operators import stats

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, seconds_offset, user_id, value, event_type)"""
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, v, m) for i, s, u, v, m in rows],
        "event_id long, ts timestamp, user_id long, value double, event_type string",
    )


def test_gini_equal_amounts_is_zero(spark):
    df = _events(spark, [(i, i, 1, 10.0, "a") for i in range(5)])
    row = stats.gini_per_entity(df).collect()[0]
    assert row["gini_amount"] == pytest.approx(0.0, abs=1e-12)


def test_gini_total_inequality(spark):
    # one person holds everything: gini → (n-1)/n for [0,0,...,X]
    df = _events(spark, [(0, 0, 1, 0.0, "a"), (1, 1, 1, 0.0, "a"), (2, 2, 1, 9.0, "a")])
    row = stats.gini_per_entity(df).collect()[0]
    assert row["gini_amount"] == pytest.approx(2 / 3)


def test_hhi_single_category_is_one(spark):
    df = _events(spark, [(i, i, 1, 1.0, "a") for i in range(4)])
    row = stats.hhi_per_entity(df).collect()[0]
    assert row["concentration_hhi"] == pytest.approx(1.0)
    assert row["n_categories"] == 1


def test_hhi_uniform_k_categories(spark):
    df = _events(spark, [(i, i, 1, 1.0, t) for i, t in enumerate("abcd")])
    row = stats.hhi_per_entity(df).collect()[0]
    assert row["concentration_hhi"] == pytest.approx(0.25)


def test_entropy_uniform_is_log2k(spark):
    # 4 events in 4 distinct hours → entropy = log2(4) = 2 bits
    rows = [(i, i * 3600, 1, 1.0, "a") for i in range(4)]
    df = _events(spark, rows)
    row = stats.entropy_per_entity(df).collect()[0]
    assert row["hour_entropy"] == pytest.approx(2.0, abs=1e-6)
    assert row["peak_bucket_ratio"] == pytest.approx(0.25)


def test_entropy_degenerate_is_zero(spark):
    rows = [(i, i, 1, 1.0, "a") for i in range(5)]  # same hour
    df = _events(spark, rows)
    row = stats.entropy_per_entity(df).collect()[0]
    assert row["hour_entropy"] == pytest.approx(0.0, abs=1e-6)
    assert row["peak_bucket_ratio"] == 1.0


def test_interarrival_regular_spacing(spark):
    df = _events(spark, [(i, i * 60, 1, 1.0, "a") for i in range(5)])
    row = stats.interarrival_stats(df).collect()[0]
    assert row["n_gaps"] == 4
    assert row["avg_gap_s"] == pytest.approx(60.0)
    assert row["std_gap_s"] == pytest.approx(0.0)
    assert row["regularity_score"] == pytest.approx(0.0)
    assert row["burst_ratio"] == 1.0  # all gaps < 300s


def test_interarrival_burst_ratio(spark):
    df = _events(spark, [(0, 0, 1, 1.0, "a"), (1, 10, 1, 1.0, "a"), (2, 1000, 1, 1.0, "a")])
    row = stats.interarrival_stats(df).collect()[0]
    assert row["burst_ratio"] == pytest.approx(0.5)


def test_trend_perfect_line(spark):
    # value = 2*i → slope 2, |r| = 1
    df = _events(spark, [(i, i * 60, 1, 2.0 * (i + 1), "a") for i in range(5)])
    row = stats.trend_per_entity(df).collect()[0]
    assert row["amount_trend_slope"] == pytest.approx(2.0)
    assert row["amount_trend_strength"] == pytest.approx(1.0)


def test_trend_flat_has_zero_strength(spark):
    df = _events(spark, [(i, i * 60, 1, 7.0, "a") for i in range(5)])
    row = stats.trend_per_entity(df).collect()[0]
    assert row["amount_trend_slope"] == pytest.approx(0.0)
    assert row["amount_trend_strength"] == 0.0


def test_moments_symmetric_zero_skew(spark):
    df = _events(spark, [(0, 0, 1, 1.0, "a"), (1, 1, 1, 2.0, "a"), (2, 2, 1, 3.0, "a")])
    row = stats.moments_per_entity(df).collect()[0]
    assert row["amount_skewness"] == pytest.approx(0.0, abs=1e-6)
    # population var of {1,2,3} = 2/3; cv = sqrt(2/3)/2
    assert row["amount_cv"] == pytest.approx(math.sqrt(2 / 3) / 2, abs=1e-6)
    # kurtosis of 2-point-symmetric {1,2,3}: m4/m2^2 - 3 = (2*1/3)/(4/9)-3 = 1.5-3
    assert row["amount_kurtosis"] == pytest.approx(-1.5, abs=1e-6)


def test_population_zscore(spark):
    # users with constant per-event values 10, 20, 30 → means 10/20/30
    rows = []
    for u, v in [(1, 10.0), (2, 20.0), (3, 30.0)]:
        rows += [(u * 10 + i, i, u, v, "a") for i in range(3)]
    df = _events(spark, rows)
    out = {r["user_id"]: r for r in stats.population_zscore(df).collect()}
    # population std of means = sqrt(200/3)
    sd = math.sqrt(200 / 3)
    assert out[1]["amount_zscore"] == pytest.approx(-10 / sd, abs=1e-6)
    assert out[2]["amount_zscore"] == pytest.approx(0.0, abs=1e-6)
    assert out[3]["amount_percentile"] == pytest.approx(1.0)
    assert out[1]["amount_percentile"] == pytest.approx(0.0)


def test_approx_quantiles_within_rank_error(spark):
    """percentile_approx(accuracy=10000) vs exact percentile: each approx
    value must sit between the exact values at q +- (rank error + one
    sample rank, since the sketch emits actual samples)."""
    from pyspark.sql import functions as F

    from aml_feature_store_spark.sources import load_table

    df = load_table(spark, "/root/testdata/sf0.01", "events")
    # GK rank error (1e-4) + one-rank discretization: percentile_approx
    # returns an actual sample, exact percentile interpolates between two
    n_min = min(
        r["n"] for r in df.groupBy("event_type").count().withColumnRenamed(
            "count", "n").collect()
    )
    eps = 1e-4 + 2.0 / n_min
    checks = []
    for q in (0.5, 0.95, 0.99):
        checks += [
            F.percentile("value", F.lit(max(q - eps, 0.0))).alias(f"lo{q}"),
            F.percentile("value", F.lit(min(q + eps, 1.0))).alias(f"hi{q}"),
            F.percentile_approx("value", F.lit(q), F.lit(10000)).alias(f"ap{q}"),
        ]
    for r in df.groupBy("event_type").agg(*checks).collect():
        for q in (0.5, 0.95, 0.99):
            assert r[f"lo{q}"] <= r[f"ap{q}"] <= r[f"hi{q}"], (r["event_type"], q)


def test_robust_zscore_flags_only_the_outlier(spark):
    """9 values near 10 plus one at 1000: MAD stays tiny, so exactly one
    event crosses |0.6745*(x-med)/MAD| > 3.5; the mean/std z-score would
    have been dragged by the outlier itself."""
    from aml_feature_store_spark.queries.stat_features import (
        robust_zscore_outliers,
    )

    rows = [(1, float(v)) for v in [9, 9.5, 10, 10.2, 10.4, 9.8, 10.1, 9.9, 10.3]]
    rows.append((1, 1000.0))
    df = spark.createDataFrame(rows, ["user_id", "value"])

    import aml_feature_store_spark.sources as src

    orig = src.load_table
    try:
        src.load_table = lambda *a, **k: df
        import aml_feature_store_spark.queries.stat_features as sf

        sf_orig = sf.load_table
        sf.load_table = lambda *a, **k: df
        out = robust_zscore_outliers(spark, "unused").collect()[0]
        sf.load_table = sf_orig
    finally:
        src.load_table = orig
    assert out["n"] == 10
    assert out["n_outliers"] == 1
    assert abs(out["median_value"] - 10.05) < 1e-6
