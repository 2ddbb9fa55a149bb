"""Drift detection + model evaluation as native SQL (SURVEY §2.10 D7,
§3 feedback loop; reference: feedback/feedback_system.py:166-273).

- **KS statistic** between two samples (reference period vs current
  period) computed from empirical CDFs with window functions — no scipy:
  D = max over observed values of |F1(x) − F2(x)|.
- **AUC** via the rank/Mann-Whitney formulation:
  AUC = (Σ ranks(positives) − n⁺(n⁺+1)/2) / (n⁺·n⁻), with average ranks
  for ties (rank = (rank_min + rank_max)/2 ≡ avg of row_numbers).
- **Precision/recall/F1/accuracy** at a threshold from integer confusion
  counts.

All deterministic integer/exact arithmetic until a final double division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .prefix import global_cumsum


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D for value_col between group_a/b rows.

    Single pass: counts per (value, group) → cumulative counts over value
    order → D = max |cumA/nA − cumB/nB| evaluated at every observed value.
    Returns one row: (n_a, n_b, ks_stat).
    """
    tagged = df.select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("in_a"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("in_b"),
    ).filter((F.col("in_a") == 1) | (F.col("in_b") == 1))
    per_v = tagged.groupBy("v").agg(
        F.sum("in_a").alias("ca"), F.sum("in_b").alias("cb")
    )
    # distributed two-pass prefix sums: a bare Window.orderBy would drag the
    # whole (distinct-value) relation to one partition — a scale-killer when
    # the score/value column is continuous at 100 TB
    cum = global_cumsum(per_v, "v", ["ca", "cb"]).select(
        F.col("cum_ca").alias("cuma"),
        F.col("cum_cb").alias("cumb"),
        F.col("tot_ca").cast("long").alias("na"),
        F.col("tot_cb").cast("long").alias("nb"),
    )
    # empty-group guard (ANSI mode): an empty sample's empirical CDF is 0
    fa = F.when(
        F.col("na") != 0, F.col("cuma").cast("double") / F.col("na").cast("double")
    ).otherwise(F.lit(0.0))
    fb = F.when(
        F.col("nb") != 0, F.col("cumb").cast("double") / F.col("nb").cast("double")
    ).otherwise(F.lit(0.0))
    d = F.abs(fa - fb)
    return cum.groupBy("na", "nb").agg(F.max(d).alias("ks_stat")).select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"), "ks_stat"
    )


def ks_statistic_sql(
    table: str, value: str, group: str, group_a: str, group_b: str
) -> str:
    return f"""
WITH tagged AS (
  SELECT {value} AS v,
         CASE WHEN {group} = {group_a} THEN 1 ELSE 0 END AS in_a,
         CASE WHEN {group} = {group_b} THEN 1 ELSE 0 END AS in_b
  FROM {table}
  WHERE {group} = {group_a} OR {group} = {group_b}
), per_v AS (
  SELECT v, SUM(in_a) AS ca, SUM(in_b) AS cb FROM tagged GROUP BY v
), cum AS (
  SELECT SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
         SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
         SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
  FROM per_v
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       MAX(ABS(
         CASE WHEN na != 0 THEN CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE) ELSE 0.0 END
       - CASE WHEN nb != 0 THEN CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE) ELSE 0.0 END
       )) AS ks_stat
FROM cum GROUP BY na, nb
"""


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """ROC AUC via average ranks (ties handled like scipy/sklearn).

    avg rank over score order = (2·cum_before + cnt + 1)/2 per tied score
    group; Σ over positive rows. Exact rational arithmetic until the final
    division. Returns one row (n_pos, n_neg, auc).
    """
    per_s = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("pos"),
    )
    # sum of avg-ranks of positives within a tie group of size cnt starting
    # after `before` rows: pos * (before + (cnt+1)/2); scale ×2 to stay int.
    # `before` (exclusive prefix) and the totals come from the distributed
    # two-pass scan — no single-partition Window.orderBy over the distinct
    # score relation (unbounded cardinality for continuous scores).
    g = global_cumsum(per_s, "s", ["cnt", "pos"])
    with_rank = g.select(
        "cnt",
        "pos",
        (F.col("cum_cnt") - F.col("cnt")).alias("before"),
        F.col("tot_pos").cast("long").alias("npos_t"),
        (F.col("tot_cnt") - F.col("tot_pos")).cast("long").alias("nneg_t"),
    )
    two_ranksum = F.sum(
        F.col("pos") * (F.lit(2) * F.col("before") + F.col("cnt") + F.lit(1))
    )
    agg = with_rank.groupBy("npos_t", "nneg_t").agg(two_ranksum.alias("r2"))
    npos, nneg = F.col("npos_t"), F.col("nneg_t")
    auc_raw = (
        F.col("r2").cast("double") / F.lit(2.0)
        - (npos * (npos + 1)).cast("double") / F.lit(2.0)
    )
    auc = F.when((npos * nneg) != 0, auc_raw / (npos * nneg).cast("double")).otherwise(
        F.lit(0.5)
    )
    return agg.select(
        npos.alias("n_pos"), nneg.alias("n_neg"), auc.alias("auc")
    )


def binary_auc_by(
    df: DataFrame, score_col: str, label_col: str, group_col: str
) -> DataFrame:
    """Per-group ROC AUC (same average-rank construction as binary_auc,
    every window/aggregation additionally keyed by the group column).
    Returns one row per group (group, n_pos, n_neg, auc)."""
    per_s = df.groupBy(
        F.col(group_col).alias("_g"), F.col(score_col).alias("s")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("pos"),
    )
    w = Window.partitionBy("_g").orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wall = Window.partitionBy("_g")
    with_rank = per_s.select(
        "_g",
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("before"),
        F.sum(F.when(F.col("pos") > 0, F.col("pos")).otherwise(0)).over(wall).alias(
            "npos_t"
        ),
        F.sum(F.col("cnt") - F.col("pos")).over(wall).alias("nneg_t"),
    )
    two_ranksum = F.sum(
        F.col("pos") * (F.lit(2) * F.col("before") + F.col("cnt") + F.lit(1))
    )
    agg = with_rank.groupBy("_g", "npos_t", "nneg_t").agg(two_ranksum.alias("r2"))
    npos, nneg = F.col("npos_t"), F.col("nneg_t")
    auc_raw = (
        F.col("r2").cast("double") / F.lit(2.0)
        - (npos * (npos + 1)).cast("double") / F.lit(2.0)
    )
    auc = F.when((npos * nneg) != 0, auc_raw / (npos * nneg).cast("double")).otherwise(
        F.lit(0.5)
    )
    return agg.select(
        F.col("_g").alias(group_col),
        npos.alias("n_pos"),
        nneg.alias("n_neg"),
        auc.alias("auc"),
    )


def binary_auc_by_sql(source_sql: str, score: str, label: str, group: str) -> str:
    """DuckDB mirror of :func:`binary_auc_by` (group exposed as `g`)."""
    return f"""
WITH src AS ({source_sql}),
per_s AS (
  SELECT {group} AS g, {score} AS s, COUNT(*) AS cnt,
         SUM(CASE WHEN {label} THEN 1 ELSE 0 END) AS pos
  FROM src GROUP BY {group}, {score}
), r AS (
  SELECT g, cnt, pos,
    COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS before,
    SUM(pos) OVER (PARTITION BY g) AS npos_t,
    SUM(cnt - pos) OVER (PARTITION BY g) AS nneg_t
  FROM per_s
), agg AS (
  SELECT g, npos_t, nneg_t,
         SUM(pos * (2 * before + cnt + 1)) AS r2
  FROM r GROUP BY g, npos_t, nneg_t
)
SELECT g, CAST(npos_t AS BIGINT) AS n_pos, CAST(nneg_t AS BIGINT) AS n_neg,
  CASE WHEN npos_t * nneg_t != 0 THEN
    (CAST(r2 AS DOUBLE) / 2.0 - CAST(npos_t * (npos_t + 1) AS DOUBLE) / 2.0)
      / CAST(npos_t * nneg_t AS DOUBLE)
  ELSE 0.5 END AS auc
FROM agg
"""


def binary_auc_sql(source_sql: str, score: str, label: str) -> str:
    return f"""
WITH src AS ({source_sql}),
per_s AS (
  SELECT {score} AS s, COUNT(*) AS cnt,
         SUM(CASE WHEN {label} THEN 1 ELSE 0 END) AS pos
  FROM src GROUP BY {score}
), r AS (
  SELECT cnt, pos,
    COALESCE(SUM(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
    SUM(pos) OVER () AS npos_t,
    SUM(cnt - pos) OVER () AS nneg_t
  FROM per_s
), agg AS (
  SELECT npos_t, nneg_t,
         SUM(pos * (2 * before + cnt + 1)) AS r2
  FROM r GROUP BY npos_t, nneg_t
)
SELECT CAST(npos_t AS BIGINT) AS n_pos, CAST(nneg_t AS BIGINT) AS n_neg,
  CASE WHEN npos_t * nneg_t != 0 THEN
    (CAST(r2 AS DOUBLE) / 2.0 - CAST(npos_t * (npos_t + 1) AS DOUBLE) / 2.0)
      / CAST(npos_t * nneg_t AS DOUBLE)
  ELSE 0.5 END AS auc
FROM agg
"""


def classification_metrics(
    df: DataFrame, score_col: str, label_col: str, threshold: float = 0.5
) -> DataFrame:
    """Confusion counts + precision/recall/F1/accuracy at a threshold
    (reference: feedback_system.py model_performance columns)."""
    pred = F.col(score_col) >= F.lit(threshold)
    lab = F.col(label_col)
    tp = F.sum(F.when(pred & lab, 1).otherwise(0)).alias("tp")
    fp = F.sum(F.when(pred & ~lab, 1).otherwise(0)).alias("fp")
    fn = F.sum(F.when(~pred & lab, 1).otherwise(0)).alias("fn")
    tn = F.sum(F.when(~pred & ~lab, 1).otherwise(0)).alias("tn")
    agg = df.agg(tp, fp, fn, tn)

    def d(c: Column) -> Column:
        return c.cast("double")

    prec = F.when(
        (F.col("tp") + F.col("fp")) != 0, d(F.col("tp")) / d(F.col("tp") + F.col("fp"))
    ).otherwise(F.lit(0.0))
    rec = F.when(
        (F.col("tp") + F.col("fn")) != 0, d(F.col("tp")) / d(F.col("tp") + F.col("fn"))
    ).otherwise(F.lit(0.0))
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(prec + rec != 0.0, F.lit(2.0) * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
        .alias("f1"),
        (d(F.col("tp") + F.col("tn"))
         / d(F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))).alias(
            "accuracy"
        ),
    )


def classification_metrics_sql(
    source_sql: str, score: str, label: str, threshold: float = 0.5
) -> str:
    return f"""
WITH src AS ({source_sql}),
c AS (
  SELECT
    SUM(CASE WHEN {score} >= {threshold} AND {label} THEN 1 ELSE 0 END) AS tp,
    SUM(CASE WHEN {score} >= {threshold} AND NOT {label} THEN 1 ELSE 0 END) AS fp,
    SUM(CASE WHEN {score} < {threshold} AND {label} THEN 1 ELSE 0 END) AS fn,
    SUM(CASE WHEN {score} < {threshold} AND NOT {label} THEN 1 ELSE 0 END) AS tn
  FROM src
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
  CASE WHEN tp + fp != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END AS precision,
  CASE WHEN tp + fn != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END AS recall,
  CASE WHEN (CASE WHEN tp + fp != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
          + (CASE WHEN tp + fn != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END) != 0.0 THEN
    2.0 * (CASE WHEN tp + fp != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
        * (CASE WHEN tp + fn != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END)
        / ((CASE WHEN tp + fp != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
           + (CASE WHEN tp + fn != 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END))
  ELSE 0.0 END AS f1,
  CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE) AS accuracy
FROM c
"""
