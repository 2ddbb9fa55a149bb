"""Trailing-window feature computation (batch) — the engine's workhorse.

Replaces the reference's three divergent per-event/per-row implementations
(reference: flink_job/aml_stream_processor.py:130-201,
flink_job/real_time_processor.py:153-230, notebooks/aml_analysis.ipynb cell 6)
with ONE window-function pass: for every event, aggregates over that
entity's events in the trailing interval ``(ts - W, ts]`` are computed by
``Window.partitionBy(entity).orderBy(epoch_ms).rangeBetween(-W_ms, 0)`` —
no per-row loop, one shuffle on the entity key shared by ALL windows and
ALL metrics (Catalyst collapses same-spec window functions into a single
WindowExec over a single sort).

Semantics decisions (SURVEY.md §2.4):
- stddev is **population** stddev (matches both Flink jobs; the notebook's
  pandas sample-std is the outlier) — A5.
- velocity = count / window_hours — A7 (parameterizable unit).
- window bound is inclusive ``[ts - W, ts]`` in epoch-milliseconds on both
  the engine and the DuckDB oracle side, so frames are bit-identical.

Float determinism (oracle contract): SUM/AVG go through DECIMAL(25,2) so
the result is exact and independent of partition / addition order, then
cast back to DOUBLE. Variance-family stats are computed from exact decimal
sums of x and x**2 then finished in double arithmetic — deterministic
given identical expression trees in Spark and DuckDB.

Scale notes (100 TB): one hash-shuffle on entity key; per-key state is the
sorted partition slice (Spark's WindowExec spills via UnsafeExternalSorter).
Hot keys (the reference injects 20-30% of traffic on 100 hot customers)
are bounded by events-per-key×24h, not table size. Exact windowed distinct
counts use collect_set (memory ∝ distinct per frame) — switch
``distinct_exact=False`` for HLL-sketch approximation at scale.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import reduce
from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame, Window, functions as F

# canonical window sizes, seconds (reference: real_time_processor.py:157-173
# uses 1m/5m/15m/1h/6h/24h; aml_stream_processor.py:147-149 uses 60s/5m/10m/1h)
WINDOWS_6 = {
    "1m": 60,
    "5m": 300,
    "15m": 900,
    "1h": 3600,
    "6h": 21600,
    "24h": 86400,
}

DEC = "decimal(25,2)"
DEC4 = "decimal(30,4)"


@dataclass
class TrailingWindowSpec:
    """Configuration of a trailing-window feature pass."""

    entity_col: str = "user_id"
    ts_col: str = "ts"
    amount_col: str = "value"
    windows: dict[str, int] = field(default_factory=lambda: dict(WINDOWS_6))
    distinct_cols: tuple[str, ...] = ()  # e.g. ("event_type",) → unique_* feats
    distinct_exact: bool = True
    velocity_unit_s: int = 3600  # denominator unit for velocity (per hour)


@dataclass
class HotBucketSpec:
    """Time-bucketization plan for hot entities (see
    :func:`hot_entity_cuts`): each listed entity's rows are split into
    ``buckets`` fixed-width epoch-ms segments so the scalable trailing
    plan can parallelize a key that would otherwise serialize one task.

    ``ents`` maps entity value → (lo_ms, width_ms). Bucket id is
    ``clamp((ms - lo) div width, 0, buckets-1)`` — a deterministic
    monotone function of the row's order key, so equal timestamps always
    share a bucket (range-frame peers are never split) and every row of
    an earlier bucket sorts strictly below every row of a later one.
    Entities not listed ride bucket 0 and are untouched."""

    buckets: int
    ents: dict


def _ms(ts_col: str) -> Column:
    return F.unix_millis(F.col(ts_col))


def trailing_features(df: DataFrame, spec: TrailingWindowSpec) -> DataFrame:
    """Append ``{metric}_{window}`` columns for every event row.

    Metrics per window W (reference names, feature_repo/definitions.py:32-41):
    txn_count, txn_amount_sum, avg_txn_amount, max_txn_amount,
    min_txn_amount, std_txn_amount (population), velocity_score,
    unique_{col} for each distinct col.
    """
    # materialize the order key once: if every frame orders by the SAME
    # attribute, EnsureRequirements drops the redundant per-Window sorts
    # (one Exchange + one Sort feed all WindowExec nodes).
    #
    # The ~42 window expressions are built as SQL strings and shipped in
    # ONE selectExpr call (r12, guide §5 driver work): the Column-by-
    # Column spelling cost ~460 py4j round-trips ≈ 0.65 s of driver wall
    # PER PLAN BUILD at steady state — pure socket latency, re-paid on
    # every invocation. The strings parse to the identical expression
    # trees (pytest-pinned bit-equal vs the Column spelling; all
    # fractional literals carry the D suffix so they stay DOUBLE — a
    # bare 0.02 parses as DECIMAL(2,2)).
    out = df.withColumn("_ts_ms", _ms(spec.ts_col))
    q = lambda c: f"`{c}`"  # noqa: E731
    amt = q(spec.amount_col)
    amt_dec = f"CAST({amt} AS {DEC})"
    amt_sq_dec = f"CAST(({amt} * {amt}) AS {DEC4})"
    exprs = ["*"]
    for wname, wsecs in spec.windows.items():
        w = (
            f"OVER (PARTITION BY {q(spec.entity_col)} ORDER BY _ts_ms "
            f"RANGE BETWEEN {wsecs * 1000} PRECEDING AND CURRENT ROW)"
        )
        n = f"count(1) {w}"
        s = f"CAST(sum({amt_dec}) {w} AS DOUBLE)"
        s2 = f"CAST(sum({amt_sq_dec}) {w} AS DOUBLE)"
        mean = f"({s} / {n})"
        # population variance via E[x^2] - E[x]^2 on exact sums
        var = f"greatest({s2} / {n} - {mean} * {mean}, 0.0D)"
        vel = repr(wsecs / spec.velocity_unit_s)
        exprs += [
            f"{n} AS {q(f'txn_count_{wname}')}",
            f"{s} AS {q(f'txn_amount_sum_{wname}')}",
            f"{mean} AS {q(f'avg_txn_amount_{wname}')}",
            f"max({amt}) {w} AS {q(f'max_txn_amount_{wname}')}",
            f"min({amt}) {w} AS {q(f'min_txn_amount_{wname}')}",
            f"round(sqrt({var}), 6) AS {q(f'std_txn_amount_{wname}')}",
            f"CAST({n} AS DOUBLE) / {vel}D AS {q(f'velocity_score_{wname}')}",
        ]
        for dcol in spec.distinct_cols:
            if spec.distinct_exact:
                dexpr = f"CAST(size(collect_set({q(dcol)}) {w}) AS BIGINT)"
            else:
                dexpr = f"approx_count_distinct({q(dcol)}, 0.02D) {w}"
            exprs.append(f"{dexpr} AS {q(f'unique_{dcol}_{wname}')}")
    return out.selectExpr(*exprs).drop("_ts_ms")


def trailing_sums_scalable(
    df: DataFrame,
    spec: TrailingWindowSpec,
    hot_buckets: HotBucketSpec | None = None,
) -> DataFrame:
    """Big-frame strategy for the invertible window aggregates
    (count/sum/avg/velocity): cumulative sums + shadow probes.

    Spark's WindowExec recomputes sliding-frame aggregates per row —
    O(rows × frame). For wide windows on hot keys (24 h × thousands of
    events) that dominates. This strategy is O(rows) regardless of frame
    width:

      sum[t−W, t] = cum(t) − cum(t−W−1ms)

    computed with ONE unbounded-preceding range frame (incrementally
    maintained by Spark) over the events unioned with one "shadow" probe
    row per (event, window) at ts−W−1ms, then a join to reattach each
    event's probe values. Decimal accumulation keeps the subtraction
    exact, so results are bit-identical to :func:`trailing_features` for
    the covered metrics (non-invertible min/max/std stay on the
    frame-based operator).
    Reference semantics: same per-event trailing windows
    (flink_job/real_time_processor.py:153-210).

    ``hot_buckets``: same hot-entity time-bucketization as
    :func:`trailing_features_scalable` — the cumulative sums partition
    by (entity, bucket) and add their literal bucket-prefix carry, so a
    key owning a large share of the log no longer serializes one task.
    Only the sums carry applies here (no extrema machinery);
    bit-equivalence is pytest-pinned.
    """
    ms = _ms(spec.ts_col)
    base = df.select(
        F.col(spec.entity_col).alias("_ent"),
        F.col("event_id"),
        ms.alias("_ms"),
        F.col(spec.amount_col).alias("_amt"),
    )
    real = base.select(
        "_ent", "event_id", "_ms", "_amt", F.lit(None).cast("string").alias("_win")
    )
    # probe _amt nulls carry the amount column's own type: a hardcoded
    # double here would coerce the whole union (and so every extremum /
    # sum input) to double for decimal amounts
    amt_t = dict(base.dtypes)["_amt"]
    shadows = None
    for wname, wsecs in spec.windows.items():
        s = base.select(
            "_ent",
            "event_id",
            (F.col("_ms") - F.lit(wsecs * 1000 + 1)).alias("_ms"),
            F.lit(None).cast(amt_t).alias("_amt"),
            F.lit(wname).alias("_win"),
        )
        shadows = s if shadows is None else shadows.unionByName(s)
    u = real.unionByName(shadows)
    bucketized = hot_buckets is not None and bool(hot_buckets.ents)
    if bucketized:
        skey = _hot_cache_key(df, spec, hot_buckets)
        carry = _hot_carry_literals(df, spec, hot_buckets, key=skey)
        u = u.withColumn("_b", _bucket_expr(hot_buckets))
        w = (
            Window.partitionBy("_ent", "_b")
            .orderBy("_ms")
            .rangeBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy("_ent")
            .orderBy("_ms")
            .rangeBetween(Window.unboundedPreceding, 0)
        )
    amt_dec = F.when(F.col("_win").isNull(), F.col("_amt")).cast(DEC)
    cnt_flag = F.when(F.col("_win").isNull(), 1).otherwise(0)
    cs: Column = F.sum(amt_dec).over(w)
    cn: Column = F.sum(cnt_flag).over(w)
    if bucketized:
        # stitch the bucket-prefix carry (coalesced — every downstream
        # read of _cum_s already coalesces empty frames to 0)
        sums = _STITCH_CACHE.get(("sums", skey)) if skey is not None else None
        if sums is None:
            sums = _carry_sum_exprs(hot_buckets, carry)
            if skey is not None:
                _cache_put(_STITCH_CACHE, ("sums", skey), sums, _CARRY_CACHE_CAP)
        cy_s, cy_n, _ = sums
        cs = F.coalesce(cs, F.lit(0).cast(_SUM_T)) + cy_s
        cn = cn + cy_n
    cum = u.select(
        "_ent",
        "event_id",
        "_win",
        cs.alias("_cum_s"),
        cn.alias("_cum_n"),
    )
    # reattach each event's probe values by PIVOTING the (1 real + W probe)
    # rows of each event into one row with a grouped aggregation on
    # (_ent, event_id). The window's hashpartitioning(_ent) already
    # satisfies the aggregation's clustering requirement, so this adds NO
    # shuffle — the whole strategy is one Exchange + one Sort end-to-end
    # (a per-window join on event_id would re-shuffle the table W times).
    agg_exprs = [
        F.max(F.when(F.col("_win").isNull(), F.col("_cum_s"))).alias("_at_s"),
        F.max(F.when(F.col("_win").isNull(), F.col("_cum_n"))).alias("_at_n"),
    ]
    for wname in spec.windows:
        agg_exprs += [
            F.max(
                F.when(
                    F.col("_win") == wname,
                    F.coalesce(F.col("_cum_s"), F.lit(0).cast(DEC)),
                )
            ).alias(f"_bs_{wname}"),
            F.max(F.when(F.col("_win") == wname, F.col("_cum_n"))).alias(
                f"_bn_{wname}"
            ),
        ]
    out = cum.groupBy("_ent", "event_id").agg(*agg_exprs)
    for wname, wsecs in spec.windows.items():
        n = F.col("_at_n") - F.col(f"_bn_{wname}")
        s = (
            F.coalesce(F.col("_at_s"), F.lit(0).cast(DEC))
            - F.col(f"_bs_{wname}")
        ).cast("double")
        out = out.withColumns(
            {
                f"txn_count_{wname}": n,
                f"txn_amount_sum_{wname}": s,
                f"avg_txn_amount_{wname}": s / n,
                f"velocity_score_{wname}": n.cast("double")
                / F.lit(wsecs / spec.velocity_unit_s),
            }
        )
    keep = [F.col("_ent").alias(spec.entity_col), "event_id"] + [
        c
        for wname in spec.windows
        for c in (
            f"txn_count_{wname}",
            f"txn_amount_sum_{wname}",
            f"avg_txn_amount_{wname}",
            f"velocity_score_{wname}",
        )
    ]
    return out.select(*keep)


def _bucket_expr(hb: HotBucketSpec) -> Column:
    """``_b`` column: ``clamp((_ms - lo) div width, 0, buckets-1)`` per
    hot entity, 0 for everything else — deterministic and monotone in
    the order key, so equal timestamps always co-bucket."""
    nb = hb.buckets
    return reduce(
        lambda acc, item: F.when(
            F.col("_ent") == F.lit(item[0]),
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(nb - 1),
                    F.expr(f"(_ms - {item[1][0]}L) div {item[1][1]}L"),
                ),
            ).cast("int"),
        ).otherwise(acc),
        hb.ents.items(),
        F.lit(0),
    )


_HOT_CARRY_CACHE: dict[tuple, dict] = {}
_STITCH_CACHE: dict[tuple, object] = {}

# Session-memoization bounds (the caches' intent is "pay the stats job /
# literal fold once per repeated query over a static input", not an
# unbounded store: carry dicts hold buckets-length arrays per entity and
# stitch entries hold large Column trees). FIFO eviction — insertion
# order is recency enough for per-session reuse patterns.
_STATS_CACHE_CAP = 32
_CARRY_CACHE_CAP = 8


def _cache_put(cache: dict, key, val, cap: int) -> None:
    while len(cache) >= cap and key not in cache:
        cache.pop(next(iter(cache)))
    cache[key] = val


def clear_plan_caches() -> None:
    """Drop every memoized routing statistic, carry fold, and stitch
    Column tree. The cache keys include each input file's (size, mtime)
    for local files, so plain dataset regeneration invalidates naturally;
    call this only after an in-place rewrite the listing cannot see
    (e.g. an object-store overwrite preserving sizes)."""
    _HOT_CARRY_CACHE.clear()
    _STITCH_CACHE.clear()
    _FRAME_EST_CACHE.clear()
    _HOT_CUTS_CACHE.clear()


def _files_sig(df: DataFrame) -> tuple:
    """Cache signature of the plan's input files: (path, size, mtime_ns)
    per file, so data rewritten AT THE SAME PATHS within a driver session
    (INSERT OVERWRITE, regenerated .scale datasets) invalidates the
    memoized stats/carries instead of silently reusing stale values.
    Non-local URIs fall back to path-only entries (object stores write
    immutable objects in practice; see :func:`clear_plan_caches`)."""
    try:
        files = sorted(df.inputFiles())
    except Exception:
        return ()
    sig = []
    for p in files:
        parsed = urlparse(p)
        if parsed.scheme in ("file", ""):
            try:
                st = os.stat(parsed.path or p)
                sig.append((p, st.st_size, st.st_mtime_ns))
                continue
            except OSError:
                pass
        sig.append((p, -1, -1))
    return tuple(sig)


def _jdiv(a: int, b: int) -> int:
    """Integer division with Spark/SQL ``div`` semantics (truncation
    toward zero). Python ``//`` floors, which diverges on negative
    operands — the driver-side carry fold must bucket edge positions
    with EXACTLY the arithmetic of the plan's ``div`` expressions or a
    pre-1970 timestamp (negative epoch-ms) silently drops an extrema
    carry."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _hot_cache_key(
    df: DataFrame, spec: TrailingWindowSpec, hb: HotBucketSpec
) -> tuple | None:
    """Shared memoization key for the carry fold AND the stitch Column
    trees (building ~30 literal-array Columns costs >1 s of py4j per
    plan build — Columns are immutable expression trees, safe to reuse
    across plans)."""
    files = _files_sig(df)
    if not files:
        return None
    return (
        files,
        spec.entity_col,
        spec.ts_col,
        spec.amount_col,
        tuple(spec.windows.items()),
        tuple(spec.distinct_cols),
        hb.buckets,
        tuple(sorted((str(k), v) for k, v in hb.ents.items())),
    )


def _hot_carry_literals(
    df: DataFrame,
    spec: TrailingWindowSpec,
    hb: HotBucketSpec,
    key: tuple | None = None,
) -> dict:
    """Cross-bucket carry state of the bucketized scalable plan, folded
    on the driver from ONE hot-filtered aggregate (plus one marker
    aggregate when the spec has distinct columns) and memoized per input
    files. Bounded by construction: per hot entity, ``buckets`` running
    sums plus, per window, the extrema of the single chunk crossing each
    bucket edge (a chunk is an interval, so exactly one chunk contains
    any given edge). The collect is ≤ (hot entities × buckets × chunks
    of the narrowest window intersected per bucket) rows — at warehouse
    scale cap the span/window ratio or raise ``buckets`` width, never
    unbounded in the table size.

    Exactness: DECIMAL sums are folded with ``decimal.Decimal`` (exact,
    associative — bit-equal to any grouping); counts/markers are ints;
    extrema are IEEE doubles compared with Python ``max``/``min``
    (NaN-free domain — the operator's amount column contract).

    Returns ``{ent: {"s"/"n"/"s2": exclusive-prefix arrays[buckets],
    "mk": {tag: arrays}, "ext": {window: (ck_lo, ck_hi, px, pn, sx, sn)
    arrays — the edge-chunk ids and the carry extrema that apply iff the
    row's chunk equals that edge chunk}}}`` plus ``"__amt_t"``, the
    amount column's Spark type (the stitch builds its extrema literal
    arrays in that type so a decimal amount never coerces to double).

    Collect bound (r11, VERDICT/ADVICE): the aggregate groups by
    (entity, bucket) ONLY — ≤ cap × buckets rows regardless of the
    span/window ratio. Extrema ride conditional aggregates restricted to
    the chunk containing the row's own bucket's lower/upper edge (both
    edge-chunk ids are row-level expressions of ``_b``); the driver fold
    re-attributes them across buckets: rows of bucket b' < b inside
    chunk ck_lo(b) are exactly the rows of the own-upper-edge aggregate
    of b' when ck_hi(b') == ck_lo(b) (a chunk is an interval — holding a
    point of bucket b' and the edge of bucket b ≥ b'+1 means it holds
    edge b'+1 too), and symmetrically for the suffix side. An earlier
    variant grouped by every window's chunk id jointly, whose group
    count was span/narrowest-window per entity — unbounded in the span,
    a driver OOM risk at exactly the scale this machinery targets."""
    from decimal import Decimal

    if key is None:
        key = _hot_cache_key(df, spec, hb)
    if key is not None and key in _HOT_CARRY_CACHE:
        return _HOT_CARRY_CACHE[key]
    nb = hb.buckets
    hot_ids = list(hb.ents)
    ms = _ms(spec.ts_col)
    base = (
        df.filter(F.col(spec.entity_col).isin(hot_ids))
        .select(
            F.col(spec.entity_col).alias("_ent"),
            F.col("event_id"),
            ms.alias("_ms"),
            F.col(spec.amount_col).alias("_amt"),
            *[F.col(d).alias(f"_v_{d}") for d in spec.distinct_cols],
        )
        .withColumn("_b", _bucket_expr(hb))
        .withColumn(
            "_lo",
            _carry_case(
                hb, lambda e: F.lit(hb.ents[e][0]).cast("long"), F.lit(0).cast("long")
            ),
        )
        .withColumn(
            "_w",
            _carry_case(
                hb, lambda e: F.lit(hb.ents[e][1]).cast("long"), F.lit(1).cast("long")
            ),
        )
    )
    amt_t = dict(base.dtypes)["_amt"]
    agg_exprs = [
        F.sum(F.col("_amt").cast(DEC)).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
        F.sum((F.col("_amt") * F.col("_amt")).cast(DEC4)).alias("_s2"),
    ]
    for wname, wsecs in spec.windows.items():
        wms_ = wsecs * 1000
        ck = F.expr(f"_ms div {wms_}")
        ck_lo_b = F.expr(f"(_lo + _b * _w) div {wms_}")
        ck_hi_b = F.expr(f"(_lo + (_b + 1) * _w) div {wms_}")
        agg_exprs += [
            F.max(F.when(ck == ck_lo_b, F.col("_amt"))).alias(f"_lx_{wname}"),
            F.min(F.when(ck == ck_lo_b, F.col("_amt"))).alias(f"_ln_{wname}"),
            F.max(F.when(ck == ck_hi_b, F.col("_amt"))).alias(f"_hx_{wname}"),
            F.min(F.when(ck == ck_hi_b, F.col("_amt"))).alias(f"_hn_{wname}"),
        ]
    grouped = base.groupBy("_ent", "_b").agg(*agg_exprs).collect()
    mrows = []
    if spec.distinct_cols:
        legs = []
        for d in spec.distinct_cols:
            prev = F.lag("_ms").over(
                Window.partitionBy("_ent", f"_v_{d}").orderBy("_ms", "event_id")
            )
            pc = base.withColumn("_prev", prev).filter(
                F.col(f"_v_{d}").isNotNull()
            )
            structs = []
            for wname, wsecs in spec.windows.items():
                wms_ = wsecs * 1000
                start = F.when(
                    F.col("_prev").isNull(), F.col("_ms")
                ).otherwise(
                    F.greatest(F.col("_ms"), F.col("_prev") + F.lit(wms_ + 1))
                )
                tag = F.lit(f"{wname}::{d}")
                structs.append(
                    F.struct(start.alias("m"), tag.alias("t"), F.lit(1).alias("v"))
                )
                structs.append(
                    F.struct(
                        (F.col("_ms") + F.lit(wms_ + 1)).alias("m"),
                        tag.alias("t"),
                        F.lit(-1).alias("v"),
                    )
                )
            legs.append(
                pc.select("_ent", F.explode(F.array(*structs)).alias("_m"))
                .select(
                    "_ent",
                    F.col("_m.m").alias("_ms"),
                    F.col("_m.t").alias("_mtag"),
                    F.col("_m.v").alias("_mval"),
                )
            )
        mall = reduce(lambda a, b: a.unionByName(b), legs)
        mrows = (
            mall.withColumn("_b", _bucket_expr(hb))
            .groupBy("_ent", "_b", "_mtag")
            .agg(F.sum("_mval").alias("_mv"))
            .collect()
        )
    out = {}
    for ent, (lo, width) in hb.ents.items():
        rows = [r for r in grouped if r["_ent"] == ent]
        sums: dict[int, list] = {}
        for r in rows:
            acc = sums.setdefault(r["_b"], [Decimal(0), 0, Decimal(0)])
            if r["_s"] is not None:
                acc[0] += r["_s"]
            acc[1] += r["_n"]
            if r["_s2"] is not None:
                acc[2] += r["_s2"]
        s_arr: list = []
        n_arr: list = []
        s2_arr: list = []
        rs, rn, r2 = Decimal(0), 0, Decimal(0)
        for b in range(nb):
            s_arr.append(rs)
            n_arr.append(rn)
            s2_arr.append(r2)
            if b in sums:
                rs += sums[b][0]
                rn += sums[b][1]
                r2 += sums[b][2]
        ext = {}
        for wname, wsecs in spec.windows.items():
            wms_ = wsecs * 1000
            # _jdiv, not //: must match the plan's `div` (trunc-to-zero)
            ck_lo = [_jdiv(lo + b * width, wms_) for b in range(nb)]
            ck_hi = [_jdiv(lo + (b + 1) * width, wms_) for b in range(nb)]
            lx = {r["_b"]: r[f"_lx_{wname}"] for r in rows}
            ln = {r["_b"]: r[f"_ln_{wname}"] for r in rows}
            hx = {r["_b"]: r[f"_hx_{wname}"] for r in rows}
            hn = {r["_b"]: r[f"_hn_{wname}"] for r in rows}
            px: list = [None] * nb
            pn: list = [None] * nb
            sx: list = [None] * nb
            sn: list = [None] * nb
            for b in range(nb):
                prev_e = [
                    hx[b2]
                    for b2 in range(b)
                    if ck_hi[b2] == ck_lo[b] and hx.get(b2) is not None
                ]
                if prev_e:
                    px[b] = max(prev_e)
                    pn[b] = min(
                        hn[b2]
                        for b2 in range(b)
                        if ck_hi[b2] == ck_lo[b] and hn.get(b2) is not None
                    )
                post_e = [
                    lx[b2]
                    for b2 in range(b + 1, nb)
                    if ck_lo[b2] == ck_hi[b] and lx.get(b2) is not None
                ]
                if post_e:
                    sx[b] = max(post_e)
                    sn[b] = min(
                        ln[b2]
                        for b2 in range(b + 1, nb)
                        if ck_lo[b2] == ck_hi[b] and ln.get(b2) is not None
                    )
            ext[wname] = (ck_lo, ck_hi, px, pn, sx, sn)
        mk: dict[str, list] = {}
        for wname in spec.windows:
            for d in spec.distinct_cols:
                tag = f"{wname}::{d}"
                per_b = {
                    r["_b"]: r["_mv"]
                    for r in mrows
                    if r["_ent"] == ent and r["_mtag"] == tag
                }
                arr: list = []
                run = 0
                for b in range(nb):
                    arr.append(run)
                    run += per_b.get(b, 0) or 0
                mk[tag] = arr
        out[ent] = {"s": s_arr, "n": n_arr, "s2": s2_arr, "ext": ext, "mk": mk}
    out["__amt_t"] = amt_t
    if key is not None:
        _cache_put(_HOT_CARRY_CACHE, key, out, _CARRY_CACHE_CAP)
    return out


# stitched-sum literal types: one sum-aggregate step above DEC/DEC4
_SUM_T = "decimal(35,2)"
_SUM2_T = "decimal(38,4)"


def _carry_case(hb: HotBucketSpec, builder, default) -> Column:
    """CASE over the hot entities: ``builder(ent)`` for each, else
    ``default`` (what every non-hot row gets)."""
    return reduce(
        lambda acc, e: F.when(F.col("_ent") == F.lit(e), builder(e)).otherwise(acc),
        list(hb.ents),
        default,
    )


def _dec_arr(vals, t) -> Column:
    """One ARRAY literal of exact decimals (single Literal node — an
    F.array of N lit().cast() children costs real Catalyst time per
    plan build at N=buckets × ~15 arrays). Values are ≤2/4 dp, so the
    inferred decimal(38,18) literal casts to the sum type exactly."""
    from decimal import Decimal

    return F.lit([Decimal(str(v)) for v in vals]).cast(f"array<{t}>")


def _num_arr(vals, t) -> Column:
    """One ARRAY literal of ints/doubles; an all-None extrema carry
    column degrades to a NULL array (element_at(null, i) is null — the
    same no-carry semantics)."""
    vals = list(vals)
    if all(v is None for v in vals):
        return F.lit(None).cast(f"array<{t}>")
    return F.lit(vals).cast(f"array<{t}>")


def _carry_sum_exprs(hb: HotBucketSpec, carry: dict) -> tuple[Column, Column, Column]:
    """The (sum, count, sum-of-squares) bucket-prefix carries as literal
    array lookups by ``_b`` — shared by both cum+probe strategies."""
    bidx = F.col("_b") + 1
    dec_arr, num_arr = _dec_arr, _num_arr

    cy_s = _carry_case(
        hb,
        lambda e: F.element_at(dec_arr(carry[e]["s"], _SUM_T), bidx),
        F.lit(0).cast(_SUM_T),
    )
    cy_n = _carry_case(
        hb,
        lambda e: F.element_at(num_arr(carry[e]["n"], "long"), bidx),
        F.lit(0).cast("long"),
    )
    cy_s2 = _carry_case(
        hb,
        lambda e: F.element_at(dec_arr(carry[e]["s2"], _SUM2_T), bidx),
        F.lit(0).cast(_SUM2_T),
    )
    return cy_s, cy_n, cy_s2


def _stitch_exprs(
    spec: TrailingWindowSpec,
    hb: HotBucketSpec,
    carry: dict,
    tags: list[tuple[str, str]],
) -> dict[str, Column]:
    """Global-stitch expressions for the bucketized plan: sums add their
    exclusive bucket-prefix (literal array lookup by ``_b``; 0 for
    non-hot rows — every downstream read of these columns already
    coalesces empty frames to 0, so the null→0 degrade is
    value-identical); extrema take the null-skipping ``greatest/least``
    of (local, carry), where the carry applies only when the row's chunk
    is the bucket-edge chunk."""
    bidx = F.col("_b") + 1
    # extrema literals in the amount column's own type — a double-typed
    # carry under a decimal amount would coerce the bucketized plan's
    # max/min to double, diverging from the unbucketized plan's type
    amt_t = carry.get("__amt_t", "double")

    def case_over(builder, default):
        return _carry_case(hb, builder, default)

    num_arr = _num_arr
    zs = F.lit(0).cast(_SUM_T)
    z2 = F.lit(0).cast(_SUM2_T)
    cy_s, cy_n, cy_s2 = _carry_sum_exprs(hb, carry)
    glob = {
        "_cs_i": F.coalesce(F.col("_cs_i"), zs) + cy_s,
        "_cn_i": F.col("_cn_i") + cy_n,
        "_c2_i": F.coalesce(F.col("_c2_i"), z2) + cy_s2,
        "_cs_e": F.coalesce(F.col("_cs_e"), zs) + cy_s,
        "_cn_e": F.col("_cn_e") + cy_n,
        "_c2_e": F.coalesce(F.col("_c2_e"), z2) + cy_s2,
    }
    for wname, d in tags:
        tag = f"{wname}::{d}"
        glob[f"_cd_{wname}_{d}"] = F.col(f"_cd_{wname}_{d}") + case_over(
            lambda e, t=tag: F.element_at(num_arr(carry[e]["mk"][t], "long"), bidx),
            F.lit(0).cast("long"),
        )
    for wname, wsecs in spec.windows.items():
        ckw = F.expr(f"_ms div {wsecs * 1000}")

        def ext_case(iv, ic, w=wname):
            return case_over(
                lambda e, w=w, iv=iv, ic=ic: F.when(
                    ckw
                    == F.element_at(num_arr(carry[e]["ext"][w][ic], "long"), bidx),
                    F.element_at(num_arr(carry[e]["ext"][w][iv], amt_t), bidx),
                ),
                F.lit(None).cast(amt_t),
            )

        glob[f"_pmx_{wname}"] = F.greatest(F.col(f"_pmx_{wname}"), ext_case(2, 0))
        glob[f"_pmn_{wname}"] = F.least(F.col(f"_pmn_{wname}"), ext_case(3, 0))
        glob[f"_smx_{wname}"] = F.greatest(F.col(f"_smx_{wname}"), ext_case(4, 1))
        glob[f"_smn_{wname}"] = F.least(F.col(f"_smn_{wname}"), ext_case(5, 1))
    return glob


def trailing_features_scalable(
    df: DataFrame,
    spec: TrailingWindowSpec,
    hot_buckets: HotBucketSpec | None = None,
) -> DataFrame:
    """Full-metric big-frame strategy: every ``trailing_features`` metric
    except windowed distincts in O(rows), independent of frame width.

    - count/sum/avg/std/velocity: cumulative DECIMAL sums of x and x² with
      one shadow probe per (event, window) at ts−W; frame value =
      cum_incl(t) − cum_excl(probe) (both unbounded-preceding frames,
      incrementally maintained by WindowExec — never O(frame) per row).
    - min/max (non-invertible): the two-level sliding-extrema
      decomposition. Chunk each entity's timeline into W-wide blocks
      (chunk = ms div W); a trailing frame [t−W, t] always spans exactly
      the suffix of chunk(t)−1 from t−W plus the prefix of chunk(t) up to
      t. Both pieces are unbounded-preceding running extrema — the prefix
      over (entity, chunk) ascending read at the event row, the suffix
      over (entity, chunk) descending read at the probe row — so the
      frame extremum is ``greatest/least`` of two O(1)-per-row columns.
    - exact windowed distinct counts (spec.distinct_cols): the
      previous-occurrence interval decomposition. An event is the FIRST
      occurrence of its value inside frame(t) iff prev(ms) < t−W ≤ ms ≤ t,
      i.e. for t in the interval [max(ms, prev+W+1), ms+W] — so
      distinct(t) is interval stabbing: a ``+1`` marker row at the
      interval start, a ``−1`` marker at end+1, and the running marker
      sum read at the event row. prev comes from one lag over
      (entity, value); the markers ride the SAME cumulative-sum sort as
      the invertible metrics. Exact, O(rows), no per-frame set. (The
      collect_set path excludes NULL values; null-valued rows emit no
      markers to match.)

    One hash exchange on the entity (the chunked windows' clustering is
    satisfied by the coarser hashpartitioning(entity)); 1 + 2·|windows|
    local sorts over the (1 + |windows| + 2·|windows|·|distinct_cols|)×
    marker/probe union. Results are bit-identical to
    :func:`trailing_features` (exact decimal sums; same finishing
    expression trees) — property-tested. Only ``distinct_exact=True`` is
    supported here (per-frame HLL sketches are not decomposable; the
    approx path stays on WindowExec).

    ``hot_buckets`` (r10): even the O(rows) plan serializes each entity
    in ONE task — a key owning 25% of a 100-TB log would put 25 TB
    through a single sort/scan. With a :class:`HotBucketSpec`, the hot
    entities' rows are range-split by time into ``buckets`` segments and
    every window partitions by ``(entity, bucket)`` (and chunk), so the
    hot key's sorts/scans parallelize across the cluster. The
    cross-bucket state is bounded — ≤ buckets running sums per entity,
    plus per window the one chunk that crosses each bucket edge — so it
    is computed ONCE at plan build by a driver-side fold over one
    hot-filtered aggregate (memoized per input files, like the routing
    stats) and stitched back as LITERAL array lookups keyed by the
    bucket id:

    - cumulative sums/counts/markers: ``local + exclusive_prefix[b]``
      (exact ``decimal.Decimal``/int addition on the driver — DECIMAL
      addition is associative, so the stitched sums are bit-equal to
      the single-task ones);
    - chunk extrema: a carry applies only when the row's chunk is the
      one containing the bucket's lower (asc) / upper (desc) edge —
      ``greatest/least(local, carry[b])`` with null-skipping semantics,
      so empty carries degrade to the local value.

    An earlier variant delivered carries as broadcast JOINS; that
    dragged ~19 extra columns through all seven window sorts and blew
    the fused stage's codegen (A/B: 23-316 s vs this design's ~5 s at
    the skew anchor). Literal stitching keeps the sort payload at one
    extra int and adds no joins, no extra scans at execution time.

    Bucket boundaries cut only between distinct timestamps (bucket id is
    a monotone function of ``_ms``), so range-frame peers are never
    split and "all earlier buckets" is exactly "all strictly-preceding
    rows". Non-hot entities ride bucket 0 with empty carries — their
    values come out of the identical expression tree with the carry legs
    defaulted away. Bit-equivalence incl. ties/markers is pytest-pinned.
    """
    if spec.distinct_cols and not spec.distinct_exact:
        raise ValueError(
            "per-frame HLL sketches are not decomposable into cumulative "
            "markers; use trailing_features for distinct_exact=False"
        )
    ms = _ms(spec.ts_col)
    base = df.select(
        F.col(spec.entity_col).alias("_ent"),
        F.col("event_id"),
        ms.alias("_ms"),
        F.col(spec.amount_col).alias("_amt"),
        *[F.col(d).alias(f"_v_{d}") for d in spec.distinct_cols],
    )
    for d in spec.distinct_cols:
        base = base.withColumn(
            f"_prev_{d}",
            F.lag("_ms").over(
                Window.partitionBy("_ent", f"_v_{d}").orderBy("_ms", "event_id")
            ),
        )
    mk_tags = [
        (wname, wsecs, d)
        for wname, wsecs in spec.windows.items()
        for d in spec.distinct_cols
    ]
    shape = ["_ent", "event_id", "_ms", "_amt", "_win", "_mtag", "_mval"]
    real = base.select(
        "_ent",
        "event_id",
        "_ms",
        "_amt",
        F.lit(None).cast("string").alias("_win"),
        F.lit(None).cast("string").alias("_mtag"),
        F.lit(0).alias("_mval"),
    )
    # see trailing_sums_scalable: probe nulls in the amount's own type
    amt_t = dict(base.dtypes)["_amt"]
    shadows = None
    for wname, wsecs in spec.windows.items():
        s = base.select(
            "_ent",
            "event_id",
            (F.col("_ms") - F.lit(wsecs * 1000)).alias("_ms"),
            F.lit(None).cast(amt_t).alias("_amt"),
            F.lit(wname).alias("_win"),
            F.lit(None).cast("string").alias("_mtag"),
            F.lit(0).alias("_mval"),
        )
        shadows = s if shadows is None else shadows.unionByName(s)
    u = real.unionByName(shadows)
    for d in spec.distinct_cols:
        # ±1 interval markers per (event, window) for this distinct col:
        # the value is "new in frame(t)" for t in [max(ms, prev+W+1), ms+W]
        structs = []
        for wname, wsecs in spec.windows.items():
            wms = wsecs * 1000
            start = F.when(
                F.col(f"_prev_{d}").isNull(), F.col("_ms")
            ).otherwise(
                F.greatest(F.col("_ms"), F.col(f"_prev_{d}") + F.lit(wms + 1))
            )
            tag = F.lit(f"{wname}::{d}")
            structs.append(
                F.struct(start.alias("m"), tag.alias("t"), F.lit(1).alias("v"))
            )
            structs.append(
                F.struct(
                    (F.col("_ms") + F.lit(wms + 1)).alias("m"),
                    tag.alias("t"),
                    F.lit(-1).alias("v"),
                )
            )
        markers = (
            base.filter(F.col(f"_v_{d}").isNotNull())
            .select(F.col("_ent"), F.explode(F.array(*structs)).alias("_m"))
            .select(
                "_ent",
                F.lit(None).cast("long").alias("event_id"),
                F.col("_m.m").alias("_ms"),
                F.lit(None).cast(amt_t).alias("_amt"),
                F.lit("__mk").alias("_win"),
                F.col("_m.t").alias("_mtag"),
                F.col("_m.v").alias("_mval"),
            )
        )
        u = u.unionByName(markers.select(*shape))
    amt_dec = F.when(F.col("_win").isNull(), F.col("_amt")).cast(DEC)
    amt2_dec = F.when(
        F.col("_win").isNull(), F.col("_amt") * F.col("_amt")
    ).cast(DEC4)
    cnt_flag = F.when(F.col("_win").isNull(), 1).otherwise(0)
    tags = [
        (wname, d) for wname in spec.windows for d in spec.distinct_cols
    ]
    bucketized = hot_buckets is not None and bool(hot_buckets.ents)
    if bucketized:
        skey = _hot_cache_key(df, spec, hot_buckets)
        carry = _hot_carry_literals(df, spec, hot_buckets, key=skey)
        u = u.withColumn("_b", _bucket_expr(hot_buckets))
        u = u.repartition("_ent", "_b")
        part = ["_ent", "_b"]
    else:
        u = u.repartition("_ent")
        part = ["_ent"]

    wcum = Window.partitionBy(*part).orderBy("_ms")
    incl = wcum.rangeBetween(Window.unboundedPreceding, 0)
    excl = wcum.rangeBetween(Window.unboundedPreceding, -1)
    cols = {
        "_cs_i": F.sum(amt_dec).over(incl),
        "_cn_i": F.sum(cnt_flag).over(incl),
        "_c2_i": F.sum(amt2_dec).over(incl),
        "_cs_e": F.sum(amt_dec).over(excl),
        "_cn_e": F.coalesce(F.sum(cnt_flag).over(excl), F.lit(0)),
        "_c2_e": F.sum(amt2_dec).over(excl),
    }
    for wname in spec.windows:
        for d in spec.distinct_cols:
            cols[f"_cd_{wname}_{d}"] = F.sum(
                F.when(F.col("_mtag") == f"{wname}::{d}", F.col("_mval")).otherwise(0)
            ).over(incl)
    for wname, wsecs in spec.windows.items():
        ck = F.expr(f"_ms div {wsecs * 1000}")
        asc = (
            Window.partitionBy(*part, ck)
            .orderBy("_ms")
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        desc = (
            Window.partitionBy(*part, ck)
            .orderBy(F.col("_ms").desc())
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        cols[f"_pmx_{wname}"] = F.max("_amt").over(asc)
        cols[f"_pmn_{wname}"] = F.min("_amt").over(asc)
        cols[f"_smx_{wname}"] = F.max("_amt").over(desc)
        cols[f"_smn_{wname}"] = F.min("_amt").over(desc)
    cum = u.withColumns(cols)
    if bucketized:
        glob = _STITCH_CACHE.get(("full", skey)) if skey is not None else None
        if glob is None:
            glob = _stitch_exprs(spec, hot_buckets, carry, tags)
            if skey is not None:
                _cache_put(_STITCH_CACHE, ("full", skey), glob, _CARRY_CACHE_CAP)
        cum = cum.withColumns(glob)
    cum = cum.filter(F.col("_win").isNull() | (F.col("_win") != "__mk"))

    isreal = F.col("_win").isNull()
    agg_exprs = [
        F.max(F.when(isreal, F.col("_cs_i"))).alias("_at_s"),
        F.max(F.when(isreal, F.col("_cn_i"))).alias("_at_n"),
        F.max(F.when(isreal, F.col("_c2_i"))).alias("_at_s2"),
        *[
            F.max(F.when(isreal, F.col(f"_cd_{wname}_{d}"))).alias(
                f"_cd_{wname}_{d}"
            )
            for wname in spec.windows
            for d in spec.distinct_cols
        ],
    ]
    for wname in spec.windows:
        isw = F.col("_win") == wname
        agg_exprs += [
            F.max(
                F.when(isw, F.coalesce(F.col("_cs_e"), F.lit(0).cast(DEC)))
            ).alias(f"_bs_{wname}"),
            F.max(F.when(isw, F.col("_cn_e"))).alias(f"_bn_{wname}"),
            F.max(
                F.when(isw, F.coalesce(F.col("_c2_e"), F.lit(0).cast(DEC4)))
            ).alias(f"_b2_{wname}"),
            F.max(F.when(isw, F.col(f"_smx_{wname}"))).alias(f"_sx_{wname}"),
            F.min(F.when(isw, F.col(f"_smn_{wname}"))).alias(f"_sn_{wname}"),
            F.max(F.when(isreal, F.col(f"_pmx_{wname}"))).alias(f"_px_{wname}"),
            F.min(F.when(isreal, F.col(f"_pmn_{wname}"))).alias(f"_pn_{wname}"),
        ]
    out = cum.groupBy("_ent", "event_id").agg(*agg_exprs)
    for wname, wsecs in spec.windows.items():
        n = F.col("_at_n") - F.col(f"_bn_{wname}")
        s = (
            F.coalesce(F.col("_at_s"), F.lit(0).cast(DEC)) - F.col(f"_bs_{wname}")
        ).cast("double")
        s2 = (
            F.coalesce(F.col("_at_s2"), F.lit(0).cast(DEC4)) - F.col(f"_b2_{wname}")
        ).cast("double")
        mean = s / n
        var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
        out = out.withColumns(
            {
                f"txn_count_{wname}": n,
                f"txn_amount_sum_{wname}": s,
                f"avg_txn_amount_{wname}": mean,
                f"max_txn_amount_{wname}": F.greatest(
                    F.col(f"_px_{wname}"), F.col(f"_sx_{wname}")
                ),
                f"min_txn_amount_{wname}": F.least(
                    F.col(f"_pn_{wname}"), F.col(f"_sn_{wname}")
                ),
                f"std_txn_amount_{wname}": F.round(F.sqrt(var), 6),
                f"velocity_score_{wname}": n.cast("double")
                / F.lit(wsecs / spec.velocity_unit_s),
                **{
                    f"unique_{d}_{wname}": F.col(f"_cd_{wname}_{d}").cast("long")
                    for d in spec.distinct_cols
                },
            }
        )
    keep = [F.col("_ent").alias(spec.entity_col), "event_id"] + [
        c
        for wname in spec.windows
        for c in (
            f"txn_count_{wname}",
            f"txn_amount_sum_{wname}",
            f"avg_txn_amount_{wname}",
            f"max_txn_amount_{wname}",
            f"min_txn_amount_{wname}",
            f"std_txn_amount_{wname}",
            f"velocity_score_{wname}",
            *[f"unique_{d}_{wname}" for d in spec.distinct_cols],
        )
    ]
    return out.select(*keep)


def trailing_flag_counts_scalable(
    df: DataFrame,
    flags: dict[str, Column],
    window_s: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """O(rows) trailing counts of arbitrary boolean flag expressions (plus
    the total count) over one window — the cum+probe strategy specialized
    to integer indicator sums (conditional counts are invertible, so no
    extrema machinery is needed). Returns (id, entity, cnt, <flag>... )
    with ``cnt`` the frame row count and each flag column its conditional
    count. Bit-identical to the range-frame formulation.
    """
    ms = _ms(ts_col)
    names = list(flags)
    base = df.select(
        F.col(entity_col).alias("_ent"),
        F.col(id_col).alias("_id"),
        ms.alias("_ms"),
        F.lit(1).alias("_one"),
        *[flags[n].cast("int").alias(f"_f_{n}") for n in names],
    )
    real = base.withColumn("_probe", F.lit(0))
    probe = base.select(
        "_ent",
        "_id",
        (F.col("_ms") - F.lit(window_s * 1000)).alias("_ms"),
        F.lit(0).alias("_one"),
        *[F.lit(0).alias(f"_f_{n}") for n in names],
    ).withColumn("_probe", F.lit(1))
    u = real.unionByName(probe).repartition("_ent")
    wcum = Window.partitionBy("_ent").orderBy("_ms")
    incl = wcum.rangeBetween(Window.unboundedPreceding, 0)
    excl = wcum.rangeBetween(Window.unboundedPreceding, -1)
    metrics = ["_one"] + [f"_f_{n}" for n in names]
    cum = u.withColumns(
        {
            **{f"_ci{c}": F.sum(c).over(incl) for c in metrics},
            **{
                f"_ce{c}": F.coalesce(F.sum(c).over(excl), F.lit(0))
                for c in metrics
            },
        }
    )
    is_real = F.col("_probe") == 0
    agg = cum.groupBy("_ent", "_id").agg(
        *[F.max(F.when(is_real, F.col(f"_ci{c}"))).alias(f"_at{c}") for c in metrics],
        *[F.max(F.when(~is_real, F.col(f"_ce{c}"))).alias(f"_b{c}") for c in metrics],
    )
    out_cols = {"cnt": F.col("_at_one") - F.col("_b_one")}
    for n in names:
        out_cols[n] = F.col(f"_at_f_{n}") - F.col(f"_b_f_{n}")
    return agg.select(
        F.col("_id").alias(id_col),
        F.col("_ent").alias(entity_col),
        *[c.alias(n) for n, c in out_cols.items()],
    )


# frame density (estimated rows per widest frame) above which the O(rows)
# scalable strategy beats WindowExec's O(rows × frame) recompute; measured
# crossover is well below this on local[32] (hot anchor: 23 s vs 4 s at
# ~220-row frames; cold anchor: 2.2 s vs 3.5 s at ~2-row frames)
AUTO_FRAME_ROWS_THRESHOLD = 32

# per-entity row count above which even the O(rows) scalable plan's
# single-task-per-entity execution dominates the query and the hot
# entity gets time-bucketized (the skew anchor's hot key owns 250k of
# 1M events; uniform corpora never cross this)
HOT_TASK_ROWS_THRESHOLD = 100_000
HOT_BUCKETS = 64

_FRAME_EST_CACHE: dict[tuple, float] = {}
_HOT_CUTS_CACHE: dict[tuple, "HotBucketSpec | None"] = {}

# Above this much input, the routing stats passes run on a seeded 1% ROW
# sample instead of the full table (the full groupBy(entity) pass is one
# cheap job at anchor scale but a real cost at warehouse scale). Row- —
# not entity- — sampling is deliberate: a 1% entity sample would MISS the
# one hot entity 99% of the time, while a 1% row sample keeps ~1000 rows
# of any entity big enough to cross HOT_TASK_ROWS_THRESHOLD (±10% at 3σ).
# 512 MB keeps every committed bench anchor (sf10 events = 194 MB) on the
# full pass, so router decisions there are pinned unchanged.
STATS_SAMPLE_BYTES = 512 * 1024 * 1024
STATS_SAMPLE_FRAC = 0.01
STATS_SAMPLE_SEED = 73
# sampled-path noise floor: entities with fewer sampled rows than this
# are dropped from the density estimate (≈800+ true rows — smaller
# entities cannot meaningfully cross any routing threshold, and a
# 1-sampled-row entity would otherwise scale to a spurious est of 1/frac)
_STATS_SAMPLE_MIN_ROWS = 8


def _stats_source(df: DataFrame, sample: bool | None) -> tuple[DataFrame, float]:
    """(stats frame, count multiplier) for the routing stats passes.
    ``sample=None`` auto-engages the 1% sample above STATS_SAMPLE_BYTES
    of (local) input; True/False force it either way (tests pin
    sample-vs-full routing agreement on the skew anchor)."""
    if sample is None:
        total = 0
        for _, size, _ in _files_sig(df):
            total += max(size, 0)
        sample = total > STATS_SAMPLE_BYTES
    if not sample:
        return df, 1.0
    return (
        df.sample(STATS_SAMPLE_FRAC, seed=STATS_SAMPLE_SEED),
        1.0 / STATS_SAMPLE_FRAC,
    )


def hot_entity_cuts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    window_max_s: int,
    min_rows: int = HOT_TASK_ROWS_THRESHOLD,
    buckets: int = HOT_BUCKETS,
    cap: int = 32,
    sample: bool | None = None,
) -> HotBucketSpec | None:
    """Detect entities whose row count would serialize a single task and
    compute their fixed-width time cuts (one groupBy job, memoized per
    input files like :func:`estimate_frame_rows`; driver result bounded
    by ``cap``). The span is padded by the widest window so shadow
    probes (ms − W) and interval markers (ms + W + 1) land inside the
    cut range; the bucket expression clamps anyway, which only affects
    balance, never correctness (bucket id stays monotone in ms).
    Returns None when no entity crosses ``min_rows``.

    At warehouse scale the pass runs on a 1% row sample (see
    :func:`_stats_source`): a hot entity keeps ~min_rows/100 sampled
    rows, counts scale by the inverse fraction, and the sample min/max
    shrink the span by ~span/samples — far less than the window pad
    already applied. Cuts are a LOAD-BALANCING plan, never a
    correctness surface: any (lo, width) yields bit-identical results
    (pytest-pinned), so sampling noise only moves bucket edges."""
    stats_df, inv = _stats_source(df, sample)
    files = _files_sig(df)
    key = (
        (files, entity_col, ts_col, window_max_s, min_rows, buckets, cap, inv)
        if files
        else None
    )
    if key is not None and key in _HOT_CUTS_CACHE:
        return _HOT_CUTS_CACHE[key]
    ms_col = F.unix_millis(F.col(ts_col))
    rows = (
        stats_df.groupBy(entity_col)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(ms_col).alias("mn"),
            F.max(ms_col).alias("mx"),
        )
        .filter(F.col("c") * F.lit(inv) >= min_rows)
        .orderBy(F.col("c").desc())
        .limit(cap)
        .collect()
    )
    if not rows:
        spec = None
    else:
        pad = window_max_s * 1000 + 1
        ents = {}
        for r in rows:
            lo = int(r["mn"]) - pad
            hi = int(r["mx"]) + pad + 1
            width = max(1, (hi - lo + buckets - 1) // buckets)
            ents[r[entity_col]] = (lo, width)
        spec = HotBucketSpec(buckets=buckets, ents=ents)
    if key is not None:
        _cache_put(_HOT_CUTS_CACHE, key, spec, _STATS_CACHE_CAP)
    return spec


def estimate_frame_rows(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    window_s: int,
    sample: bool | None = None,
) -> float:
    """One cheap stats pass → expected rows per trailing frame of the
    DENSEST entity (per-entity rows × window/per-entity-span, maxed);
    the shared density heuristic for every adaptive trailing strategy.

    The max — not the mean — is the routing statistic: WindowExec cost
    is per TASK, and a skewed key (one entity owning 25% of the log)
    makes its task O(rows × frame) while the mean still looks sparse.
    The r6 skew anchor caught exactly that: mean density 2.3 rows/frame
    routed the hot anchor onto WindowExec and one task ran for minutes.
    Cost: a groupBy(entity) count — one extra small job in the stats
    pass. At warehouse scale (input > STATS_SAMPLE_BYTES, or
    ``sample=True``) the pass runs on a 1% row sample: counts scale by
    1/frac, entities with < _STATS_SAMPLE_MIN_ROWS sampled rows are
    dropped (they cannot cross a routing threshold, and scaling a
    1-row sample would fabricate density), and the shrunk sample span
    only OVERestimates density — erring toward the O(rows) plan, the
    safe direction since both strategies are bit-identical. Memoized
    per (input files+sizes+mtimes, entity, window) for the session —
    same contract as the persisted-index cache: the routing statistic
    of a static input never changes, so repeated queries pay it once."""
    stats_df, inv = _stats_source(df, sample)
    files = _files_sig(df)
    cache_key = (files, entity_col, ts_col, window_s, inv) if files else None
    if cache_key is not None and cache_key in _FRAME_EST_CACHE:
        return _FRAME_EST_CACHE[cache_key]
    ms_col = F.unix_millis(F.col(ts_col))
    per = stats_df.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("c"),
        (F.max(ms_col) - F.min(ms_col)).alias("espan"),
    )
    if inv != 1.0:
        per = per.filter(F.col("c") >= _STATS_SAMPLE_MIN_ROWS)
    stats = per.select(
        F.max(
            F.col("c")
            * F.lit(inv)
            * F.least(
                F.lit(float(window_s * 1000))
                / F.greatest(F.col("espan").cast("double"), F.lit(1.0)),
                F.lit(1.0),
            )
        ).alias("hot")
    ).first()
    est = float(stats["hot"] or 0.0)
    if cache_key is not None:
        _cache_put(_FRAME_EST_CACHE, cache_key, est, _STATS_CACHE_CAP)
    return est


def trailing_features_auto(
    df: DataFrame,
    spec: TrailingWindowSpec,
    frame_rows_threshold: int = AUTO_FRAME_ROWS_THRESHOLD,
    hot_rows_threshold: int = HOT_TASK_ROWS_THRESHOLD,
) -> DataFrame:
    """Adaptive physical strategy for the trailing-window operator: one
    cheap stats pass estimates the widest window's expected frame size
    (rows/entity × W/span) and picks WindowExec (small frames — one sort,
    no probe blowup) or the O(rows) cumsum/chunked-extrema strategy (wide
    frames — WindowExec's per-row frame recompute dominates). Both
    strategies are bit-identical (property-tested), so the choice is
    purely physical — the Catalyst-style decision Spark cannot make
    itself because it has no frame-density statistics.

    Falls back to :func:`trailing_features` only for approximate
    windowed distincts (per-frame HLL is not marker-decomposable); exact
    distincts ride the scalable plan's interval markers.

    On the scalable path a second memoized stats pass
    (:func:`hot_entity_cuts`) checks for entities big enough to
    serialize one task (``hot_rows_threshold``); those are
    time-bucketized so their windows parallelize across the cluster —
    see ``trailing_features_scalable(hot_buckets=...)``.
    """
    if spec.distinct_cols and not spec.distinct_exact:
        return trailing_features(df, spec)
    est = estimate_frame_rows(
        df, spec.entity_col, spec.ts_col, max(spec.windows.values())
    )
    if est <= frame_rows_threshold:
        return trailing_features(df, spec)
    hb = hot_entity_cuts(
        df,
        spec.entity_col,
        spec.ts_col,
        max(spec.windows.values()),
        min_rows=hot_rows_threshold,
    )
    return trailing_features_scalable(df, spec, hot_buckets=hb)


def trailing_sums_scalable_oracle(
    spec: TrailingWindowSpec, table: str = "events"
) -> str:
    """Oracle: the PLAIN range-frame formulation — the cumsum strategy must
    produce identical values, that is the whole point."""
    parts = []
    for wname, wsecs in spec.windows.items():
        wdef = (
            f"(PARTITION BY {spec.entity_col} ORDER BY epoch_ms({spec.ts_col}) "
            f"RANGE BETWEEN {wsecs * 1000} PRECEDING AND CURRENT ROW)"
        )
        a = spec.amount_col
        n = f"COUNT(*) OVER {wdef}"
        s = f"CAST(SUM(CAST({a} AS DECIMAL(25,2))) OVER {wdef} AS DOUBLE)"
        parts += [
            f"{n} AS txn_count_{wname}",
            f"{s} AS txn_amount_sum_{wname}",
            f"({s}) / ({n}) AS avg_txn_amount_{wname}",
            f"CAST({n} AS DOUBLE) / {wsecs / spec.velocity_unit_s} "
            f"AS velocity_score_{wname}",
        ]
    return (
        f"SELECT e.{spec.entity_col}, e.event_id,\n  "
        + ",\n  ".join(parts)
        + f"\nFROM {table} e"
    )


def trailing_features_sql_oracle(spec: TrailingWindowSpec, table: str = "events") -> str:
    """The DuckDB-equivalent SQL for :func:`trailing_features` (ANSI window
    frames over epoch-ms), used by __spark_entry__.oracle_sql."""
    parts = []
    for wname, wsecs in spec.windows.items():
        wdef = (
            f"(PARTITION BY {spec.entity_col} ORDER BY epoch_ms({spec.ts_col}) "
            f"RANGE BETWEEN {wsecs * 1000} PRECEDING AND CURRENT ROW)"
        )
        a = spec.amount_col
        n = f"COUNT(*) OVER {wdef}"
        s = f"CAST(SUM(CAST({a} AS DECIMAL(25,2))) OVER {wdef} AS DOUBLE)"
        s2 = f"CAST(SUM(CAST({a}*{a} AS DECIMAL(30,4))) OVER {wdef} AS DOUBLE)"
        mean = f"({s}) / ({n})"
        var = f"GREATEST(({s2}) / ({n}) - ({mean}) * ({mean}), 0.0)"
        parts += [
            f"{n} AS txn_count_{wname}",
            f"{s} AS txn_amount_sum_{wname}",
            f"{mean} AS avg_txn_amount_{wname}",
            f"MAX({a}) OVER {wdef} AS max_txn_amount_{wname}",
            f"MIN({a}) OVER {wdef} AS min_txn_amount_{wname}",
            f"ROUND(SQRT({var}), 6) AS std_txn_amount_{wname}",
            f"CAST({n} AS DOUBLE) / {wsecs / spec.velocity_unit_s} "
            f"AS velocity_score_{wname}",
        ]
        for dcol in spec.distinct_cols:
            # DuckDB lacks DISTINCT window aggregates; equivalent trick:
            # count rows that are the first occurrence of their value within
            # reach of the frame is not expressible either — use a correlated
            # scalar subquery (fine at oracle scale, not the engine's plan).
            parts.append(
                f"(SELECT COUNT(DISTINCT e2.{dcol}) FROM {table} e2 "
                f"WHERE e2.{spec.entity_col} = e.{spec.entity_col} "
                f"AND epoch_ms(e2.{spec.ts_col}) BETWEEN "
                f"epoch_ms(e.{spec.ts_col}) - {wsecs * 1000} "
                f"AND epoch_ms(e.{spec.ts_col})) AS unique_{dcol}_{wname}"
            )
    select = ",\n  ".join(parts)
    return (
        f"SELECT e.event_id, e.{spec.entity_col},\n  {select}\n"
        f"FROM {table} e"
    )
