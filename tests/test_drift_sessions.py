"""Hand-computed tests: KS statistic, AUC, classification metrics,
sessionization, DBSCAN outliers."""

from __future__ import annotations

import datetime as dt

import pytest

from aml_feature_store_spark.operators import drift, outliers, sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_ks_identical_distributions_zero(spark):
    rows = [(float(v), g) for v in range(10) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = drift.ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert r["ks_stat"] == 0.0
    assert r["n_a"] == 10 and r["n_b"] == 10


def test_ks_disjoint_distributions_one(spark):
    rows = [(float(v), "a") for v in range(5)] + [(float(v + 100), "b") for v in range(5)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = drift.ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert r["ks_stat"] == 1.0


def test_ks_known_value(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: D = max|Fa-Fb| = 0.5 (at v=2 and v=4)
    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"), (4.0, "a"),
            (3.0, "b"), (4.0, "b"), (5.0, "b"), (6.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = drift.ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert r["ks_stat"] == pytest.approx(0.5)


def test_ks_empty_group_no_divide_by_zero(spark):
    # r3 postmortem: an empty comparison group crashed the whole bench under
    # ANSI mode (DIVIDE_BY_ZERO). Empty group → its ECDF is 0 → D = 1.0.
    rows = [(float(v), "a") for v in range(5)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = drift.ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert r["n_a"] == 5 and r["n_b"] == 0
    assert r["ks_stat"] == 1.0


def test_auc_perfect_and_reverse(spark):
    rows = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    assert drift.binary_auc(df, "s", "y").collect()[0]["auc"] == 1.0
    rows_r = [(s, not y) for s, y in rows]
    df_r = spark.createDataFrame(rows_r, "s double, y boolean")
    assert drift.binary_auc(df_r, "s", "y").collect()[0]["auc"] == 0.0


def test_auc_with_ties_is_half(spark):
    # all scores equal → AUC must be exactly 0.5 under tie-averaged ranks
    rows = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    assert drift.binary_auc(df, "s", "y").collect()[0]["auc"] == 0.5


def test_classification_metrics(spark):
    rows = [(0.9, True), (0.8, False), (0.3, True), (0.1, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = drift.classification_metrics(df, "s", "y", threshold=0.5).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 1, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.5
    assert r["f1"] == pytest.approx(0.5)
    assert r["accuracy"] == 0.5


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, v) for i, (s, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_sessionize_splits_on_gap(spark):
    # gaps: 60s, 2000s (split), 60s → two sessions of 2 events each
    df = _ev(spark, [(0, 1, 1.0), (60, 1, 2.0), (2060, 1, 3.0), (2120, 1, 4.0)])
    out = sorted(
        sessionize.sessionize(df, gap_s=1800).collect(),
        key=lambda r: r["session_id"],
    )
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[0]["sum_value"] == 3.0
    assert out[1]["n_events"] == 2 and out[1]["sum_value"] == 7.0
    assert out[0]["duration_s"] == 60.0


def test_sessionize_single_events(spark):
    df = _ev(spark, [(0, 1, 1.0), (10000, 2, 2.0)])
    out = sessionize.sessionize(df, gap_s=1800).collect()
    assert len(out) == 2 and all(r["n_events"] == 1 for r in out)


def test_dbscan_small_group_defaults(spark):
    df = _ev(spark, [(0, 1, 10.0), (60, 1, 11.0)])  # < min_samples
    r = outliers.dbscan_outlier_features(df).collect()[0]
    assert r["n_points"] == 2 and r["n_clusters"] == 0 and r["outlier_ratio"] == 0.0


def test_dbscan_detects_outlier(spark):
    # 10 tightly clustered values + 1 extreme at the same hour
    rows = [(i * 10, 1, 100.0 + (i % 3)) for i in range(10)] + [(100, 1, 100000.0)]
    df = _ev(spark, rows)
    r = outliers.dbscan_outlier_features(df, eps=0.5, min_samples=4).collect()[0]
    assert r["n_clusters"] == 1
    assert r["outlier_ratio"] == pytest.approx(1 / 11)


def test_dbscan_cluster_stats_known_geometry(spark):
    """Pre-scaled DBSCAN (the oracle-checkable configuration): two tight
    5-point clusters far apart plus one isolated point -> 2 clusters,
    noise ratio 1/11; border points count as clustered, not noise."""
    from aml_feature_store_spark.operators.outliers import dbscan_cluster_stats

    pts = (
        [(0.0 + 0.1 * i, 0.0) for i in range(5)]        # cluster A
        + [(10.0 + 0.1 * i, 0.0) for i in range(5)]     # cluster B
        + [(5.0, 5.0)]                                   # noise
    )
    df = spark.createDataFrame(
        [(1, z1, z2) for z1, z2 in pts], "user_id long, z1 double, z2 double"
    )
    r = dbscan_cluster_stats(df, eps=0.5, min_samples=4).collect()[0]
    assert (r["n_points"], r["n_clusters"]) == (11, 2)
    assert r["outlier_ratio"] == pytest.approx(1 / 11, abs=1e-12)


def test_psi_zero_for_identical_and_large_for_shifted(spark):
    from aml_feature_store_spark.operators.drift import psi

    same = spark.createDataFrame(
        [(float(v % 100), p) for v in range(400) for p in ("ref", "cur")],
        ["value", "period"],
    )
    r = psi(same, "value", "period", "ref", "cur").collect()[0]
    assert abs(r["psi"]) < 1e-9 and not r["significant_shift"]

    shifted = spark.createDataFrame(
        [(float(v % 100), "ref") for v in range(400)]
        + [(float(v % 100) + 80.0, "cur") for v in range(400)],
        ["value", "period"],
    )
    r = psi(shifted, "value", "period", "ref", "cur").collect()[0]
    assert r["psi"] > 0.2 and r["significant_shift"]


def test_chi2_zero_for_identical_counts(spark):
    from aml_feature_store_spark.operators.drift import chi2_categorical

    rows = [(t, p) for t in ("a", "b", "c") for p in ("ref", "cur")
            for _ in range(50)]
    df = spark.createDataFrame(rows, ["cat", "period"])
    r = chi2_categorical(df, "cat", "period", "ref", "cur").collect()[0]
    assert abs(r["chi2"]) < 1e-9
    assert r["dof"] == 2 and r["n_events"] == 300

    skew = spark.createDataFrame(
        [("a", "ref")] * 90 + [("b", "ref")] * 10
        + [("a", "cur")] * 10 + [("b", "cur")] * 90,
        ["cat", "period"],
    )
    r = chi2_categorical(skew, "cat", "period", "ref", "cur").collect()[0]
    assert r["chi2"] > 100  # extreme flip on n=200: chi2 = 128


def test_chi2_counts_vanished_category_cells(spark):
    """ADVICE r5 (medium): a category present in only ONE period must
    contribute its empty cell's (0-E)^2/E = E — the strongest-drift
    shape. Pinned against the textbook statistic AND the DuckDB oracle
    (both engines build the full cat x period spine)."""
    import duckdb

    from aml_feature_store_spark.operators.drift import (
        chi2_categorical,
        chi2_categorical_sql,
    )

    # 'gone' occurs 40x in ref, never in cur
    rows = (
        [("a", "ref")] * 60 + [("gone", "ref")] * 40 + [("a", "cur")] * 100
    )
    df = spark.createDataFrame(rows, ["cat", "period"])
    r = chi2_categorical(df, "cat", "period", "ref", "cur").collect()[0]
    # textbook: O = [[60,100],[40,0]], row tots 160/40, col tots 100/100
    # E = [[80,80],[20,20]]; chi2 = 400/80 + 400/80 + 400/20 + 400/20 = 50
    assert abs(r["chi2"] - 50.0) < 1e-6, r["chi2"]
    assert r["dof"] == 1 and r["n_events"] == 200

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"('{c}', '{p}')" for c, p in rows)
                + ") AS v(cat, period)")
    sql = chi2_categorical_sql("t", "cat", "period", "'ref'", "'cur'")
    oracle = con.execute(sql).fetchone()
    assert abs(oracle[0] - 50.0) < 1e-6 and oracle[1] == 1 and oracle[2] == 200
