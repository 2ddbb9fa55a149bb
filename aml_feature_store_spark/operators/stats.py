"""Statistical / behavioral aggregate operators (SURVEY §2.4 A9-A20).

All native Catalyst expressions — no UDFs. Each operator is written as a
set-oriented groupBy/window plan replacing the reference's per-customer
pandas loops (reference: feature_engineering/advanced_features.py:115-311,
flink_job/real_time_processor.py:213-228, notebooks cell 6).

Float-determinism contract (shared with the DuckDB oracle): all SUMs over
data columns go through exact DECIMAL accumulation (order-independent),
integer counts stay integral, and the final scalar math is plain double
arithmetic with an expression tree mirrored verbatim in the oracle SQL —
so results are bit-identical without tolerances. Only genuinely
transcendental reductions (entropy's Σc·log2 c, higher moments) carry a
round(·, 6) on both sides.

Scale notes: every operator here is one or two hash aggregations on the
entity key (partial+final map-side combine for free); no windows over
unbounded frames except where the semantics demand a per-entity sort
(gini/trend rank), which shuffles once on the entity key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

DEC = "decimal(25,2)"
DEC4 = "decimal(30,4)"


def _d(c: Column) -> Column:
    return c.cast("double")


def gini_per_entity(
    df: DataFrame,
    entity_col: str = "user_id",
    amount_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gini coefficient of amounts per entity (A9).

    Rank formulation ``(2·Σ i·xᵢ)/(n·Σx) − (n+1)/n`` over amounts sorted
    ascending (reference: flink_job/real_time_processor.py:213-228 — there a
    per-event Python sort; here one row_number window + one aggregation).
    Tie order cannot change the result (equal x ⇒ Σi·x invariant within the
    tie group) but we still order deterministically.
    """
    w = Window.partitionBy(entity_col).orderBy(amount_col, tiebreak_col)
    ranked = df.withColumn("_rn", F.row_number().over(w))
    agg = ranked.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(amount_col).cast(DEC)).alias("_s"),
        F.sum(F.col("_rn") * F.col(amount_col).cast(DEC)).alias("_s1"),
    )
    n, s, s1 = _d(F.col("_n")), _d(F.col("_s")), _d(F.col("_s1"))
    return agg.select(
        entity_col,
        F.col("_n").alias("txn_count"),
        F.when(s != 0.0, (F.lit(2.0) * s1) / (n * s) - (n + F.lit(1.0)) / n)
        .otherwise(F.lit(0.0))
        .alias("gini_amount"),
    )


def gini_oracle(table: str = "events", entity: str = "user_id", amount: str = "value",
                tiebreak: str = "event_id") -> str:
    return f"""
WITH ranked AS (
  SELECT {entity}, {amount},
         ROW_NUMBER() OVER (PARTITION BY {entity} ORDER BY {amount}, {tiebreak}) AS rn
  FROM {table}
), agg AS (
  SELECT {entity}, COUNT(*) AS n,
         SUM(CAST({amount} AS DECIMAL(25,2))) AS s,
         SUM(rn * CAST({amount} AS DECIMAL(25,2))) AS s1
  FROM ranked GROUP BY {entity}
)
SELECT {entity}, n AS txn_count,
       CASE WHEN CAST(s AS DOUBLE) != 0.0 THEN
         (2.0 * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
           - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
       ELSE 0.0 END AS gini_amount
FROM agg
"""


def hhi_per_entity(
    df: DataFrame,
    entity_col: str = "user_id",
    category_col: str = "event_type",
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per entity (A10).

    Σ shareᵢ² ≡ (Σ cntᵢ²)/total² — the integer-sum form is exact and
    addition-order-independent (reference:
    feature_engineering/advanced_features.py:307-311 value_counts loop).
    Two-level hash aggregation; no window needed.
    """
    lvl1 = df.groupBy(entity_col, category_col).agg(F.count(F.lit(1)).alias("_c"))
    agg = lvl1.groupBy(entity_col).agg(
        F.sum(F.col("_c") * F.col("_c")).alias("_sq"),
        F.sum("_c").alias("_tot"),
        F.count(F.lit(1)).alias("_ncat"),
    )
    tot = _d(F.col("_tot"))
    return agg.select(
        entity_col,
        F.col("_ncat").alias("n_categories"),
        (_d(F.col("_sq")) / (tot * tot)).alias("concentration_hhi"),
    )


def hhi_oracle(table: str = "events", entity: str = "user_id",
               category: str = "event_type") -> str:
    return f"""
WITH lvl1 AS (
  SELECT {entity}, {category}, COUNT(*) AS c FROM {table} GROUP BY {entity}, {category}
), agg AS (
  SELECT {entity}, SUM(c * c) AS sq, SUM(c) AS tot, COUNT(*) AS ncat
  FROM lvl1 GROUP BY {entity}
)
SELECT {entity}, ncat AS n_categories,
       CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
         AS concentration_hhi
FROM agg
"""


def entropy_per_entity(
    df: DataFrame,
    entity_col: str = "user_id",
    bucket_expr: Column | None = None,
    bucket_name: str = "hour_of_day",
    out_col: str = "hour_entropy",
) -> DataFrame:
    """Shannon entropy (bits) of a categorical distribution per entity (A11)
    plus peak-bucket ratio (A12).

    −Σ p·log2 p ≡ log2(total) − (Σ cᵢ·log2 cᵢ)/total: counts stay exact
    integers; only the final transcendental math is double (round 6 on both
    sides — addition order over ≤24 buckets is absorbed).
    Reference: feature_engineering/advanced_features.py:131-137,197-208.
    """
    b = bucket_expr if bucket_expr is not None else F.hour("ts")
    lvl1 = df.groupBy(entity_col, b.alias(bucket_name)).agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = lvl1.groupBy(entity_col).agg(
        F.sum("_c").alias("_tot"),
        F.round(F.sum(_d(F.col("_c")) * F.log2(_d(F.col("_c")))), 6).alias("_clog"),
        F.max("_c").alias("_maxc"),
    )
    tot = _d(F.col("_tot"))
    # + 0.0 on every ROUND-of-possibly-tiny-negative: DuckDB's ROUND keeps
    # IEEE -0.0, Spark's yields +0.0, and the driver hash tells them apart.
    # -0.0 + 0.0 = +0.0 in both engines; exact no-op otherwise.
    return agg.select(
        entity_col,
        (F.round(F.log2(tot) - F.col("_clog") / tot, 6) + F.lit(0.0)).alias(out_col),
        (_d(F.col("_maxc")) / tot).alias("peak_bucket_ratio"),
    )


def entropy_oracle(table: str = "events", entity: str = "user_id",
                   bucket_sql: str = "hour(ts)", bucket_name: str = "hour_of_day",
                   out_col: str = "hour_entropy") -> str:
    return f"""
WITH lvl1 AS (
  SELECT {entity}, {bucket_sql} AS {bucket_name}, COUNT(*) AS c
  FROM {table} GROUP BY {entity}, {bucket_sql}
), agg AS (
  SELECT {entity}, SUM(c) AS tot,
         ROUND(SUM(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE))), 6) AS clog,
         MAX(c) AS maxc
  FROM lvl1 GROUP BY {entity}
)
SELECT {entity},
       ROUND(LOG2(CAST(tot AS DOUBLE)) - clog / CAST(tot AS DOUBLE), 6) + 0.0 AS {out_col},
       CAST(maxc AS DOUBLE) / CAST(tot AS DOUBLE) AS peak_bucket_ratio
FROM agg
"""


def interarrival_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    burst_gap_s: int = 300,
) -> DataFrame:
    """Inter-arrival gap statistics per entity (A18, W2).

    lag() over (entity, ts) → gap in ms (exact integers) → mean/std/min/max,
    regularity = std/mean, burst ratio = share of gaps < 300 s.
    Reference: feature_engineering/advanced_features.py:141-155. Gap² sums
    accumulate in DECIMAL(38,0) (a 24h gap in ms squared overflows int64).
    """
    ms = F.unix_millis(F.col(ts_col))
    w = Window.partitionBy(entity_col).orderBy(ms, tiebreak_col)
    gaps = (
        df.withColumn("_gap", ms - F.lag(ms).over(w))
        .filter(F.col("_gap").isNotNull())
    )
    agg = gaps.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_gap").alias("_s"),
        F.sum(F.col("_gap").cast("decimal(38,0)") * F.col("_gap")).alias("_s2"),
        F.min("_gap").alias("_min"),
        F.max("_gap").alias("_max"),
        F.sum(F.when(F.col("_gap") < burst_gap_s * 1000, 1).otherwise(0)).alias("_b"),
    )
    n, s, s2 = _d(F.col("_n")), _d(F.col("_s")), _d(F.col("_s2"))
    mean_ms = s / n
    var_ms = F.greatest(s2 / n - mean_ms * mean_ms, F.lit(0.0))
    return agg.select(
        entity_col,
        F.col("_n").alias("n_gaps"),
        (mean_ms / F.lit(1000.0)).alias("avg_gap_s"),
        F.round(F.sqrt(var_ms) / F.lit(1000.0), 6).alias("std_gap_s"),
        (_d(F.col("_min")) / F.lit(1000.0)).alias("min_gap_s"),
        (_d(F.col("_max")) / F.lit(1000.0)).alias("max_gap_s"),
        F.when(mean_ms != 0.0, F.round(F.sqrt(var_ms) / mean_ms, 6))
        .otherwise(F.lit(0.0))
        .alias("regularity_score"),
        (_d(F.col("_b")) / n).alias("burst_ratio"),
    )


def interarrival_oracle(table: str = "events", entity: str = "user_id",
                        ts: str = "ts", tiebreak: str = "event_id",
                        burst_gap_s: int = 300) -> str:
    return f"""
WITH gaps AS (
  SELECT {entity},
         epoch_ms({ts}) - LAG(epoch_ms({ts})) OVER
           (PARTITION BY {entity} ORDER BY epoch_ms({ts}), {tiebreak}) AS gap
  FROM {table}
), g AS (SELECT * FROM gaps WHERE gap IS NOT NULL),
agg AS (
  SELECT {entity}, COUNT(*) AS n, SUM(gap) AS s,
         SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS s2,
         MIN(gap) AS mn, MAX(gap) AS mx,
         SUM(CASE WHEN gap < {burst_gap_s * 1000} THEN 1 ELSE 0 END) AS b
  FROM g GROUP BY {entity}
)
SELECT {entity}, n AS n_gaps,
       (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 1000.0 AS avg_gap_s,
       ROUND(SQRT(GREATEST(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) / 1000.0, 6)
         AS std_gap_s,
       CAST(mn AS DOUBLE) / 1000.0 AS min_gap_s,
       CAST(mx AS DOUBLE) / 1000.0 AS max_gap_s,
       CASE WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) != 0.0 THEN
         ROUND(SQRT(GREATEST(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
           / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
       ELSE 0.0 END AS regularity_score,
       CAST(b AS DOUBLE) / CAST(n AS DOUBLE) AS burst_ratio
FROM agg
"""


def trend_per_entity(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Linear-regression trend of amount vs event index per entity (A17).

    Closed form from exact sums (scipy.linregress equivalent; reference:
    feature_engineering/advanced_features.py:167-183):
      slope = (n·Σix − Σi·Σx) / (n·Σi² − (Σi)²),  strength = |r|.
    Index i = 1-based event rank in time order. One window + one agg.
    """
    ms = F.unix_millis(F.col(ts_col))
    w = Window.partitionBy(entity_col).orderBy(ms, tiebreak_col)
    ranked = df.withColumn("_i", F.row_number().over(w))
    agg = ranked.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_i").alias("_si"),
        F.sum(F.col("_i").cast("decimal(38,0)") * F.col("_i")).alias("_si2"),
        F.sum(F.col(amount_col).cast(DEC)).alias("_sx"),
        F.sum((F.col(amount_col) * F.col(amount_col)).cast(DEC4)).alias("_sx2"),
        F.sum(F.col("_i") * F.col(amount_col).cast(DEC)).alias("_six"),
    )
    n = _d(F.col("_n"))
    si, si2 = _d(F.col("_si")), _d(F.col("_si2"))
    sx, sx2, six = _d(F.col("_sx")), _d(F.col("_sx2")), _d(F.col("_six"))
    num = n * six - si * sx
    den_i = n * si2 - si * si
    den_x = n * sx2 - sx * sx
    return agg.select(
        entity_col,
        F.col("_n").alias("txn_count"),
        F.when(F.col("_n") > 1, num / den_i).otherwise(F.lit(0.0)).alias(
            "amount_trend_slope"
        ),
        F.when((F.col("_n") > 1) & (den_x > 0),
               F.abs(num / (F.sqrt(den_i) * F.sqrt(den_x))))
        .otherwise(F.lit(0.0))
        .alias("amount_trend_strength"),
    )


def trend_oracle(table: str = "events", entity: str = "user_id", ts: str = "ts",
                 amount: str = "value", tiebreak: str = "event_id") -> str:
    return f"""
WITH ranked AS (
  SELECT {entity}, {amount},
         ROW_NUMBER() OVER (PARTITION BY {entity}
                            ORDER BY epoch_ms({ts}), {tiebreak}) AS i
  FROM {table}
), agg AS (
  SELECT {entity}, COUNT(*) AS n, SUM(i) AS si,
         SUM(CAST(i AS DECIMAL(38,0)) * i) AS si2,
         SUM(CAST({amount} AS DECIMAL(25,2))) AS sx,
         SUM(CAST({amount} * {amount} AS DECIMAL(30,4))) AS sx2,
         SUM(i * CAST({amount} AS DECIMAL(25,2))) AS six
  FROM ranked GROUP BY {entity}
)
SELECT {entity}, n AS txn_count,
  CASE WHEN n > 1 THEN
    (CAST(n AS DOUBLE) * CAST(six AS DOUBLE) - CAST(si AS DOUBLE) * CAST(sx AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(si2 AS DOUBLE) - CAST(si AS DOUBLE) * CAST(si AS DOUBLE))
  ELSE 0.0 END AS amount_trend_slope,
  CASE WHEN n > 1 AND (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 THEN
    ABS((CAST(n AS DOUBLE) * CAST(six AS DOUBLE) - CAST(si AS DOUBLE) * CAST(sx AS DOUBLE))
        / (SQRT(CAST(n AS DOUBLE) * CAST(si2 AS DOUBLE) - CAST(si AS DOUBLE) * CAST(si AS DOUBLE))
           * SQRT(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
  ELSE 0.0 END AS amount_trend_strength
FROM agg
"""


def population_zscore(
    df: DataFrame,
    entity_col: str = "user_id",
    amount_col: str = "value",
) -> DataFrame:
    """Per-entity mean vs population of entity means: z-score + percentile
    (A15/A16, J4 population-vs-individual join).

    Scale shape: per-entity exact aggregation, then (a) population moments
    as a single-row aggregate broadcast back by cross join (no
    whole-relation window), and (b) percent_rank from the distributed
    two-pass prefix scan (operators/prefix.py) — rank = global running
    count in (mean, entity) order, which is a total order, so ties are
    impossible and percent_rank = (rank−1)/(n−1) exactly. No
    single-partition window anywhere even with billions of entities.
    Reference: feature_engineering/advanced_features.py:246-260.
    """
    from .prefix import global_cumsum

    per = df.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(amount_col).cast(DEC)).alias("_s"),
    )
    # exact per-entity mean, then re-quantized to decimal so the population
    # sums below stay addition-order-independent
    per = per.withColumn("_mean", (_d(F.col("_s")) / _d(F.col("_n"))))
    per = per.withColumn("_mean_q", F.col("_mean").cast("decimal(25,6)"))
    pop = per.agg(
        F.count(F.lit(1)).alias("_np"),
        F.sum("_mean_q").alias("_sp"),
        F.sum(F.col("_mean_q") * F.col("_mean_q")).alias("_s2p"),
    )
    ranked = global_cumsum(
        per.withColumn("_one", F.lit(1)),
        "_mean_q",
        ["_one"],
        tiebreakers=[entity_col],
    ).crossJoin(F.broadcast(pop))
    mu = _d(F.col("_sp")) / _d(F.col("_np"))
    var = F.greatest(_d(F.col("_s2p")) / _d(F.col("_np")) - mu * mu, F.lit(0.0))
    pr = F.when(
        F.col("_np") > 1,
        (F.col("cum__one") - 1).cast("double") / (F.col("_np") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return ranked.select(
        entity_col,
        F.col("_mean").alias("avg_amount"),
        # + 0.0: signed-zero normalization (see entropy_per_entity comment)
        F.when(var > 0.0, F.round((F.col("_mean") - mu) / F.sqrt(var), 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("amount_zscore"),
        F.round(pr, 6).alias("amount_percentile"),
    )


def population_zscore_oracle(table: str = "events", entity: str = "user_id",
                             amount: str = "value") -> str:
    return f"""
WITH per AS (
  SELECT {entity}, COUNT(*) AS n, SUM(CAST({amount} AS DECIMAL(25,2))) AS s
  FROM {table} GROUP BY {entity}
), m AS (
  SELECT {entity}, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(25,6)) AS mean_q
  FROM per
), pop AS (
  SELECT {entity}, mean, mean_q,
         COUNT(*) OVER () AS np, SUM(mean_q) OVER () AS sp,
         SUM(mean_q * mean_q) OVER () AS s2p,
         PERCENT_RANK() OVER (ORDER BY mean_q, {entity}) AS pr
  FROM m
)
SELECT {entity}, mean AS avg_amount,
       CASE WHEN GREATEST(CAST(s2p AS DOUBLE) / CAST(np AS DOUBLE)
             - (CAST(sp AS DOUBLE) / CAST(np AS DOUBLE)) * (CAST(sp AS DOUBLE) / CAST(np AS DOUBLE)), 0.0) > 0.0 THEN
         ROUND((mean - CAST(sp AS DOUBLE) / CAST(np AS DOUBLE))
           / SQRT(GREATEST(CAST(s2p AS DOUBLE) / CAST(np AS DOUBLE)
               - (CAST(sp AS DOUBLE) / CAST(np AS DOUBLE)) * (CAST(sp AS DOUBLE) / CAST(np AS DOUBLE)), 0.0)), 6) + 0.0
       ELSE 0.0 END AS amount_zscore,
       ROUND(pr, 6) AS amount_percentile
FROM pop
"""


def moments_per_entity(
    df: DataFrame,
    entity_col: str = "user_id",
    amount_col: str = "value",
) -> DataFrame:
    """Coefficient of variation, population skewness and excess kurtosis per
    entity (A13/A14) from raw power sums.

    scipy-default semantics pinned: Fisher kurtosis (−3), biased (population)
    moments — reference: feature_engineering/advanced_features.py:263-268.
    Higher moments use double sums + round(6) on both sides (exact decimal
    accumulation of x³/x⁴ would overflow sensible precision).
    """
    x = F.col(amount_col)
    agg = df.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x.cast(DEC)).alias("_s"),
        F.sum((x * x).cast(DEC4)).alias("_s2"),
        F.sum((x * x * x).cast("decimal(38,6)")).alias("_s3"),
        F.sum((x * x * (x * x)).cast("decimal(38,6)")).alias("_s4"),
    )
    n = _d(F.col("_n"))
    m = _d(F.col("_s")) / n
    ex2 = _d(F.col("_s2")) / n
    ex3 = _d(F.col("_s3")) / n
    ex4 = _d(F.col("_s4")) / n
    var = F.greatest(ex2 - m * m, F.lit(0.0))
    m3 = ex3 - F.lit(3.0) * m * ex2 + F.lit(2.0) * m * m * m
    m4 = (
        ex4
        - F.lit(4.0) * m * ex3
        + F.lit(6.0) * m * m * ex2
        - F.lit(3.0) * m * m * (m * m)
    )
    return agg.select(
        entity_col,
        F.col("_n").alias("txn_count"),
        # + 0.0: signed-zero normalization of the rounded higher moments
        # (DuckDB ROUND keeps -0.0, Spark's yields +0.0)
        F.when(m != 0.0, F.round(F.sqrt(var) / m, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("amount_cv"),
        F.when(var > 0, F.round(m3 / F.pow(F.sqrt(var), F.lit(3.0)), 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("amount_skewness"),
        F.when(var > 0, F.round(m4 / (var * var) - F.lit(3.0), 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("amount_kurtosis"),
    )


def behavioral_vector_fused(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
    tiebreak_col: str = "event_id",
    burst_gap_s: int = 300,
) -> DataFrame:
    """Fused single-pass computation of the full behavioral vector:
    gini + trend + inter-arrival + moments share ONE shuffle on the entity
    key (two sorts over the same exchange: by amount for the gini rank, by
    time for the trend rank/lag) and ONE combined hash aggregation;
    HHI and entropy (two-level aggs over different sub-keys) join in at
    the end via AQE-broadcast. Values are bit-identical to the
    per-operator plans (same exact-decimal sums) — the composed oracle of
    behavioral_feature_vector still applies.

    Plan shape: Scan → Exchange(user) → Sort(value) → Window →
    Sort(ts) → Window → HashAggregate → bcast-join small sides.
    vs the naive concat (J3): 6 Exchanges + 5 joins.
    """
    ms = F.unix_millis(F.col(ts_col))
    w_amt = Window.partitionBy(entity_col).orderBy(amount_col, tiebreak_col)
    w_t = Window.partitionBy(entity_col).orderBy(ms, F.col(tiebreak_col))
    x = F.col(amount_col)
    aug = df.select(
        entity_col,
        amount_col,
        F.row_number().over(w_amt).alias("_rn_a"),
        F.row_number().over(w_t).alias("_i"),
        (ms - F.lag(ms).over(w_t)).alias("_gap"),
    )
    agg = aug.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x.cast(DEC)).alias("_s"),
        F.sum((x * x).cast(DEC4)).alias("_s2"),
        F.sum((x * x * x).cast("decimal(38,6)")).alias("_s3"),
        F.sum((x * x * (x * x)).cast("decimal(38,6)")).alias("_s4"),
        F.sum(F.col("_rn_a") * x.cast(DEC)).alias("_s1g"),
        F.sum("_i").alias("_si"),
        F.sum(F.col("_i").cast("decimal(38,0)") * F.col("_i")).alias("_si2"),
        F.sum(F.col("_i") * x.cast(DEC)).alias("_six"),
        F.count("_gap").alias("_gn"),
        F.sum("_gap").alias("_gs"),
        F.sum(F.col("_gap").cast("decimal(38,0)") * F.col("_gap")).alias("_gs2"),
        F.min("_gap").alias("_gmin"),
        F.max("_gap").alias("_gmax"),
        F.sum(
            F.when(F.col("_gap") < burst_gap_s * 1000, 1).otherwise(0)
        ).alias("_gb"),
    )
    n = _d(F.col("_n"))
    s, s2 = _d(F.col("_s")), _d(F.col("_s2"))
    ex3, ex4 = _d(F.col("_s3")) / n, _d(F.col("_s4")) / n
    m = s / n
    ex2 = s2 / n
    var = F.greatest(ex2 - m * m, F.lit(0.0))
    m3 = ex3 - F.lit(3.0) * m * ex2 + F.lit(2.0) * m * m * m
    m4 = (ex4 - F.lit(4.0) * m * ex3 + F.lit(6.0) * m * m * ex2
          - F.lit(3.0) * m * m * (m * m))
    s1g = _d(F.col("_s1g"))
    si, si2, six = _d(F.col("_si")), _d(F.col("_si2")), _d(F.col("_six"))
    num = n * six - si * s
    den_i = n * si2 - si * si
    den_x = n * s2 - s * s
    gn = _d(F.col("_gn"))
    gs, gs2 = _d(F.col("_gs")), _d(F.col("_gs2"))
    gmean = gs / gn
    gvar = F.greatest(gs2 / gn - gmean * gmean, F.lit(0.0))
    # inner-join semantics of the composed plan: entities with no gaps
    # (single event) are dropped, matching interarrival_stats
    core = agg.filter(F.col("_gn") > 0).select(
        entity_col,
        F.when(s != 0.0, (F.lit(2.0) * s1g) / (n * s) - (n + F.lit(1.0)) / n)
        .otherwise(F.lit(0.0))
        .alias("gini_amount"),
        (gmean / F.lit(1000.0)).alias("avg_gap_s"),
        F.round(F.sqrt(gvar) / F.lit(1000.0), 6).alias("std_gap_s"),
        (_d(F.col("_gb")) / gn).alias("burst_ratio"),
        F.when(gmean != 0.0, F.round(F.sqrt(gvar) / gmean, 6))
        .otherwise(F.lit(0.0))
        .alias("regularity_score"),
        F.when(F.col("_n") > 1, num / den_i).otherwise(F.lit(0.0)).alias(
            "amount_trend_slope"
        ),
        F.when((F.col("_n") > 1) & (den_x > 0),
               F.abs(num / (F.sqrt(den_i) * F.sqrt(den_x))))
        .otherwise(F.lit(0.0))
        .alias("amount_trend_strength"),
        F.col("_n").alias("txn_count"),
        # + 0.0: signed-zero normalization of the rounded higher moments
        # (DuckDB ROUND keeps -0.0, Spark's yields +0.0)
        F.when(m != 0.0, F.round(F.sqrt(var) / m, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("amount_cv"),
        F.when(var > 0, F.round(m3 / F.pow(F.sqrt(var), F.lit(3.0)), 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("amount_skewness"),
        F.when(var > 0, F.round(m4 / (var * var) - F.lit(3.0), 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("amount_kurtosis"),
    )
    h = hhi_per_entity(df, entity_col)
    en = entropy_per_entity(df, entity_col)
    return core.join(h, entity_col).join(en, entity_col).select(
        entity_col,
        "gini_amount",
        "concentration_hhi",
        "n_categories",
        "hour_entropy",
        "peak_bucket_ratio",
        "avg_gap_s",
        "std_gap_s",
        "burst_ratio",
        "regularity_score",
        "amount_trend_slope",
        "amount_trend_strength",
        "txn_count",
        "amount_cv",
        "amount_skewness",
        "amount_kurtosis",
    )


def moments_oracle(table: str = "events", entity: str = "user_id",
                   amount: str = "value") -> str:
    x = amount
    return f"""
WITH agg AS (
  SELECT {entity}, COUNT(*) AS n,
         SUM(CAST({x} AS DECIMAL(25,2))) AS s,
         SUM(CAST({x} * {x} AS DECIMAL(30,4))) AS s2,
         SUM(CAST({x} * {x} * {x} AS DECIMAL(38,6))) AS s3,
         SUM(CAST({x} * {x} * ({x} * {x}) AS DECIMAL(38,6))) AS s4
  FROM {table} GROUP BY {entity}
), mm AS (
  SELECT {entity}, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS ex2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS ex3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS ex4
  FROM agg
), mv AS (
  SELECT *, GREATEST(ex2 - m * m, 0.0) AS var,
         ex3 - 3.0 * m * ex2 + 2.0 * m * m * m AS m3,
         ex4 - 4.0 * m * ex3 + 6.0 * m * m * ex2 - 3.0 * m * m * (m * m) AS m4
  FROM mm
)
SELECT {entity}, n AS txn_count,
       CASE WHEN m != 0.0 THEN ROUND(SQRT(var) / m, 6) + 0.0 ELSE 0.0 END AS amount_cv,
       CASE WHEN var > 0 THEN ROUND(m3 / POW(SQRT(var), 3.0), 6) + 0.0 ELSE 0.0 END
         AS amount_skewness,
       CASE WHEN var > 0 THEN ROUND(m4 / (var * var) - 3.0, 6) + 0.0 ELSE 0.0 END
         AS amount_kurtosis
FROM mv
"""
