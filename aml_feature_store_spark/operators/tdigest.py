"""Mergeable t-digest quantile sketch (SURVEY §2.4 A22 approximate
family; companion to the GK `percentile_approx` twin and the
Misra-Gries heavy-hitters sketch).

The t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
using t-digests", public arXiv 1902.04023) summarizes a distribution as
a short list of (mean, weight) centroids whose maximum weight shrinks
toward the tails under the k1 scale function
``k(q) = δ/(2π)·asin(2q−1)`` — so extreme quantiles (p99, p999) stay
sharp while the sketch holds O(δ) state regardless of input size.

Why this exists next to `percentile_approx`: Spark exposes GK sketches
only as an opaque aggregate — the partial state is not a value you can
store, ship, or re-aggregate in SQL. The t-digest here is a
first-class VALUE (rows of centroids), which unlocks the genuinely
100 TB shapes:

- **sketch rollup**: build per-(group, day) digests once in the nightly
  scan, persist them as a tiny table, and answer any later quantile
  query — per group, per week, global — by merging centroid rows,
  never rescanning the raw 100 TB (same pattern as the persisted
  BM25/IVF indexes in `retrieval.py`/`simsearch.py`);
- **map-side bounded state**: stage 1 is `mapInPandas` keeping
  O(groups·δ) centroids per partition and emitting only centroid rows,
  so the shuffle moves ~δ rows per group instead of the raw values.

Determinism: centroid construction is a greedy left-to-right sweep over
sorted values with float64 arithmetic — identical partitioning yields
identical digests, and the registered queries validate RANK bounds
(booleans) rather than raw sketch floats, same contract as
`quantiles_approx_by_event_type` (queries/relational.py:191).

Accuracy contract (pinned in tests/test_tdigest.py): with δ=500 the
k1 q-width at the median is π/δ ≈ 0.0063, so worst-case rank error of
midpoint interpolation is ≲ 0.004; tails are asymptotically tighter.
The registered validation uses ε=0.01 — a >2× margin, and merge
degradation (one extra level) is covered by the same margin.

Reference scope: dashboard/app.py:366-367 latency quantiles is the
semantic; the sketch is the public scale re-expression.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _k1(q: np.ndarray | float, delta: float):
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.asarray(q, dtype=np.float64) - 1.0)


def _k1_inv(y: float, delta: float) -> float:
    y = min(y, delta / 4.0)  # k(1) = δ/4; clamp keeps asin's domain
    return (math.sin(2.0 * math.pi * y / delta) + 1.0) / 2.0


def build_digest(values: np.ndarray, delta: float = 500.0):
    """Digest of raw (weight-1) values: (means, weights, vmin, vmax).

    Vectorized boundary sweep: from cumulative position q0 the next
    centroid may extend to q2 = k⁻¹(k(q0) + 1); values are pre-sorted
    and sliced with a prefix-sum mean, so the loop runs O(δ) times
    regardless of input size."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = v.size
    if n == 0:
        return np.empty(0), np.empty(0), math.nan, math.nan
    csum = np.concatenate([[0.0], np.cumsum(v)])
    means: list[float] = []
    weights: list[float] = []
    s = 0
    while s < n:
        q2 = _k1_inv(float(_k1(s / n, delta)) + 1.0, delta)
        e = min(n, max(s + 1, int(math.floor(q2 * n + 1e-9))))
        means.append((csum[e] - csum[s]) / (e - s))
        weights.append(float(e - s))
        s = e
    return np.array(means), np.array(weights), float(v[0]), float(v[-1])


def merge_digests(means: np.ndarray, weights: np.ndarray, delta: float = 500.0):
    """Merge centroid lists (concatenated) into one digest: sort by mean,
    then greedily absorb while the k1 size limit allows. Input length is
    O(partitions·δ), so the Python sweep is cheap."""
    order = np.argsort(means, kind="stable")
    means = np.asarray(means, dtype=np.float64)[order]
    weights = np.asarray(weights, dtype=np.float64)[order]
    total = float(weights.sum())
    if means.size == 0 or total == 0:
        return np.empty(0), np.empty(0)
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m = float(means[0])
    cur_w = float(weights[0])
    w_before = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_before / total
        q2 = (w_before + cur_w + w) / total
        if float(_k1(q2, delta)) - float(_k1(q0, delta)) <= 1.0:
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def digest_quantile(
    means: np.ndarray,
    weights: np.ndarray,
    vmin: float,
    vmax: float,
    q: float,
) -> float:
    """Quantile estimate: piecewise-linear through (0, vmin), the
    centroid weight-midpoints, and (total, vmax) — exact at the extremes
    whenever the edge centroids have weight 1 (they do under k1)."""
    if means.size == 0:
        return math.nan
    total = float(weights.sum())
    cum = np.cumsum(weights)
    mids = cum - weights / 2.0
    xs = np.concatenate([[0.0], mids, [total]])
    ys = np.concatenate([[vmin], means, [vmax]])
    return float(np.interp(q * total, xs, ys))


_CENTROID_SCHEMA = StructType(
    [
        StructField("g", StringType()),
        StructField("mean", DoubleType()),
        StructField("weight", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
    ]
)


def sketch_centroids(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    delta: float = 500.0,
) -> DataFrame:
    """Stage 1 — map-side digests: one `mapInPandas` pass keeping a
    bounded running digest per group key per partition (batches are
    digested and re-merged, so state stays O(groups·δ) even on an
    arbitrarily large partition), emitting centroid rows
    (group, mean, weight, vmin, vmax). No shuffle of the raw values."""
    sep = "\x1f"
    keyed = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in group_cols]).alias("g"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col(value_col).isNotNull())

    def digest_partition(it):
        import pandas as pd

        state: dict = {}  # g -> [means, weights, vmin, vmax]
        for pdf in it:
            for g, vals in pdf.groupby("g")["v"]:
                m, w, mn, mx = build_digest(vals.to_numpy(), delta)
                if g in state:
                    pm, pw, pmn, pmx = state[g]
                    mm, mw = merge_digests(
                        np.concatenate([pm, m]), np.concatenate([pw, w]), delta
                    )
                    state[g] = [mm, mw, min(pmn, mn), max(pmx, mx)]
                else:
                    state[g] = [m, w, mn, mx]
        rows = [
            (g, float(m), float(w), st[2], st[3])
            for g, st in sorted(state.items())
            for m, w in zip(st[0], st[1])
        ]
        yield pd.DataFrame(
            rows, columns=["g", "mean", "weight", "vmin", "vmax"]
        )

    return keyed.mapInPandas(digest_partition, _CENTROID_SCHEMA)


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: dict[str, float],
    delta: float = 500.0,
    pre_rollup_col: str | None = None,
) -> DataFrame:
    """Distributed t-digest quantiles per group: map-side centroid pass →
    shuffle only centroid rows → merge per group → interpolate.

    With ``pre_rollup_col`` the stage-1 digests are built per
    (group, rollup) — e.g. per day — and stage 2 merges across the
    rollup dimension, proving the re-aggregation path a persisted
    sketch table would use."""
    stage1_groups = group_cols + ([pre_rollup_col] if pre_rollup_col else [])
    cent = sketch_centroids(df, stage1_groups, value_col, delta)
    if pre_rollup_col:
        sep = "\x1f"
        # strip the rollup suffix so stage 2 merges across it
        cent = cent.withColumn(
            "g", F.substring_index(F.col("g"), sep, len(group_cols))
        )
    out_fields = [StructField("g", StringType()), StructField("n", LongType())] + [
        StructField(name, DoubleType()) for name in qs
    ]
    out_schema = StructType(out_fields)
    q_items = sorted(qs.items())

    def finish(key, pdf):
        import pandas as pd

        m, w = merge_digests(
            pdf["mean"].to_numpy(), pdf["weight"].to_numpy(), delta
        )
        vmin = float(pdf["vmin"].min())
        vmax = float(pdf["vmax"].max())
        row = {"g": key[0], "n": int(round(float(pdf["weight"].sum())))}
        for name, q in q_items:
            row[name] = digest_quantile(m, w, vmin, vmax, q)
        return pd.DataFrame([row], columns=[f.name for f in out_fields])

    merged = cent.groupBy("g").applyInPandas(finish, out_schema)
    sep = "\x1f"
    split = F.split(F.col("g"), sep)
    return merged.select(
        *[split.getItem(i).alias(c) for i, c in enumerate(group_cols)],
        "n",
        *list(qs),
    )
