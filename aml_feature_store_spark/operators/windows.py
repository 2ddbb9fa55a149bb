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

from dataclasses import dataclass, field

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
    out = df.withColumn("_ts_ms", _ms(spec.ts_col))
    amt_dec = F.col(spec.amount_col).cast(DEC)
    amt_sq_dec = (F.col(spec.amount_col) * F.col(spec.amount_col)).cast(DEC4)
    base = Window.partitionBy(spec.entity_col).orderBy(F.col("_ts_ms"))
    for wname, wsecs in spec.windows.items():
        w = base.rangeBetween(-wsecs * 1000, 0)
        n = F.count(F.lit(1)).over(w)
        s = F.sum(amt_dec).over(w).cast("double")
        s2 = F.sum(amt_sq_dec).over(w).cast("double")
        mean = s / n
        # population variance via E[x^2] - E[x]^2 on exact sums
        var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
        cols = {
            f"txn_count_{wname}": n,
            f"txn_amount_sum_{wname}": s,
            f"avg_txn_amount_{wname}": mean,
            f"max_txn_amount_{wname}": F.max(spec.amount_col).over(w),
            f"min_txn_amount_{wname}": F.min(spec.amount_col).over(w),
            f"std_txn_amount_{wname}": F.round(F.sqrt(var), 6),
            f"velocity_score_{wname}": n.cast("double")
            / F.lit(wsecs / spec.velocity_unit_s),
        }
        for dcol in spec.distinct_cols:
            if spec.distinct_exact:
                dexpr = F.size(F.collect_set(dcol).over(w)).cast("long")
            else:
                dexpr = F.approx_count_distinct(dcol, 0.02).over(w)
            cols[f"unique_{dcol}_{wname}"] = dexpr
        out = out.withColumns(cols)
    return out.drop("_ts_ms")


def trailing_sums_scalable(df: DataFrame, spec: TrailingWindowSpec) -> DataFrame:
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
    shadows = None
    for wname, wsecs in spec.windows.items():
        s = base.select(
            "_ent",
            "event_id",
            (F.col("_ms") - F.lit(wsecs * 1000 + 1)).alias("_ms"),
            F.lit(None).cast("double").alias("_amt"),
            F.lit(wname).alias("_win"),
        )
        shadows = s if shadows is None else shadows.unionByName(s)
    u = real.unionByName(shadows)
    w = (
        Window.partitionBy("_ent")
        .orderBy("_ms")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    amt_dec = F.when(F.col("_win").isNull(), F.col("_amt")).cast(DEC)
    cnt_flag = F.when(F.col("_win").isNull(), 1).otherwise(0)
    cum = u.select(
        "_ent",
        "event_id",
        "_win",
        F.sum(amt_dec).over(w).alias("_cum_s"),
        F.sum(cnt_flag).over(w).alias("_cum_n"),
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


def trailing_features_scalable(df: DataFrame, spec: TrailingWindowSpec) -> DataFrame:
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
    shadows = None
    for wname, wsecs in spec.windows.items():
        s = base.select(
            "_ent",
            "event_id",
            (F.col("_ms") - F.lit(wsecs * 1000)).alias("_ms"),
            F.lit(None).cast("double").alias("_amt"),
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
                F.lit(None).cast("double").alias("_amt"),
                F.lit("__mk").alias("_win"),
                F.col("_m.t").alias("_mtag"),
                F.col("_m.v").alias("_mval"),
            )
        )
        u = u.unionByName(markers.select(*shape))
    u = u.repartition("_ent")

    amt_dec = F.when(F.col("_win").isNull(), F.col("_amt")).cast(DEC)
    amt2_dec = F.when(
        F.col("_win").isNull(), F.col("_amt") * F.col("_amt")
    ).cast(DEC4)
    cnt_flag = F.when(F.col("_win").isNull(), 1).otherwise(0)
    wcum = Window.partitionBy("_ent").orderBy("_ms")
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
            Window.partitionBy("_ent", ck)
            .orderBy("_ms")
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        desc = (
            Window.partitionBy("_ent", ck)
            .orderBy(F.col("_ms").desc())
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        cols[f"_pmx_{wname}"] = F.max("_amt").over(asc)
        cols[f"_pmn_{wname}"] = F.min("_amt").over(asc)
        cols[f"_smx_{wname}"] = F.max("_amt").over(desc)
        cols[f"_smn_{wname}"] = F.min("_amt").over(desc)
    cum = u.withColumns(cols).filter(
        F.col("_win").isNull() | (F.col("_win") != "__mk")
    )

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

_FRAME_EST_CACHE: dict[tuple, float] = {}


def estimate_frame_rows(df: DataFrame, entity_col: str, ts_col: str, window_s: int) -> float:
    """One cheap stats pass → expected rows per trailing frame of the
    DENSEST entity (per-entity rows × window/per-entity-span, maxed);
    the shared density heuristic for every adaptive trailing strategy.

    The max — not the mean — is the routing statistic: WindowExec cost
    is per TASK, and a skewed key (one entity owning 25% of the log)
    makes its task O(rows × frame) while the mean still looks sparse.
    The r6 skew anchor caught exactly that: mean density 2.3 rows/frame
    routed the hot anchor onto WindowExec and one task ran for minutes.
    Cost: a groupBy(entity) count — one extra small job in the stats
    pass (at warehouse scale, run it on a sample; the max over a 1%
    entity sample bounds the hot key with high probability). Memoized
    per (input files, entity, window) for the session — same contract
    as the persisted-index cache: the routing statistic of a static
    input never changes, so repeated queries pay it once."""
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    cache_key = (files, entity_col, ts_col, window_s) if files else None
    if cache_key is not None and cache_key in _FRAME_EST_CACHE:
        return _FRAME_EST_CACHE[cache_key]
    ms_col = F.unix_millis(F.col(ts_col))
    per = df.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("c"),
        (F.max(ms_col) - F.min(ms_col)).alias("espan"),
    )
    stats = per.select(
        F.max(
            F.col("c")
            * F.least(
                F.lit(float(window_s * 1000))
                / F.greatest(F.col("espan").cast("double"), F.lit(1.0)),
                F.lit(1.0),
            )
        ).alias("hot")
    ).first()
    est = float(stats["hot"] or 0.0)
    if cache_key is not None:
        _FRAME_EST_CACHE[cache_key] = est
    return est


def trailing_features_auto(
    df: DataFrame,
    spec: TrailingWindowSpec,
    frame_rows_threshold: int = AUTO_FRAME_ROWS_THRESHOLD,
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
    """
    if spec.distinct_cols and not spec.distinct_exact:
        return trailing_features(df, spec)
    est = estimate_frame_rows(
        df, spec.entity_col, spec.ts_col, max(spec.windows.values())
    )
    if est <= frame_rows_threshold:
        return trailing_features(df, spec)
    return trailing_features_scalable(df, spec)


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
