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


def psi(
    df: DataFrame,
    value_col: str,
    period_col: str,
    ref_val: str,
    cur_val: str,
) -> DataFrame:
    """Population Stability Index between the reference and current
    period of a numeric column — the industry-standard drift score the
    reference's KS check (feedback_system.py:204-229) is usually paired
    with. Bins = deciles of the REFERENCE distribution (9 edges → 10
    bins), PSI = Σ (p−q)·ln(p/q) with 1e-6 flooring so empty bins stay
    finite; >0.2 is the conventional "significant shift" flag.

    Scale shape: one exact-percentile aggregation over the reference
    rows produces a 9-element broadcast array; binning is a pure column
    expression over one scan; the contingency reduce is 20 rows. No
    window, no join against the event stream.
    """
    deciles = [i / 10.0 for i in range(1, 10)]
    ref = df.filter(F.col(period_col) == ref_val)
    edges = ref.agg(
        F.transform(
            F.percentile(value_col, F.lit(deciles)),
            lambda e: F.round(e, 9),
        ).alias("edges")
    )
    binned = df.crossJoin(F.broadcast(edges)).select(
        period_col,
        F.expr(f"size(filter(edges, e -> e <= {value_col}))").alias("bin"),
    )
    # ONE conditional aggregation pivots both periods — filtered
    # self-joins would recompute the scan per branch (plan-audit finding)
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col(period_col) == ref_val, 1).otherwise(0)).alias(
            "c_ref"
        ),
        F.sum(F.when(F.col(period_col) == cur_val, 1).otherwise(0)).alias(
            "c_cur"
        ),
    )
    spine = (
        df.sparkSession.range(10)
        .select(F.col("id").cast("int").alias("bin"))
    )
    pivoted = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
        F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
    )
    tot = pivoted.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    contrib = pivoted.crossJoin(F.broadcast(tot)).select(
        "n_ref",
        "n_cur",
        F.round(
            (
                F.greatest(F.col("c_ref") / F.col("n_ref"), F.lit(1e-6))
                - F.greatest(F.col("c_cur") / F.col("n_cur"), F.lit(1e-6))
            )
            * F.log(
                F.greatest(F.col("c_ref") / F.col("n_ref"), F.lit(1e-6))
                / F.greatest(F.col("c_cur") / F.col("n_cur"), F.lit(1e-6))
            ),
            9,
        ).alias("term"),
    )
    return contrib.groupBy("n_ref", "n_cur").agg(
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("psi")
    ).select(
        "psi", (F.col("psi") > 0.2).alias("significant_shift"), "n_ref", "n_cur"
    )


def psi_sql(
    table_expr: str, value_col: str, period_col: str, ref_lit: str,
    cur_lit: str,
) -> str:
    """DuckDB oracle for :func:`psi` (same edges, flooring, rounding)."""
    return f"""
WITH src AS MATERIALIZED (SELECT * FROM {table_expr}),
edges AS (
  SELECT list_transform(
           quantile_cont({value_col}, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           e -> round(e, 9)) AS edges
  FROM src WHERE {period_col} = {ref_lit}
),
binned AS (
  SELECT {period_col} AS period,
         len(list_filter((SELECT edges FROM edges), e -> e <= {value_col}))
           AS bin
  FROM src
),
counts AS (
  SELECT period, bin, COUNT(*) AS c FROM binned GROUP BY period, bin
),
pivoted AS (
  SELECT s.bin,
         coalesce(r.c, 0) AS c_ref,
         coalesce(k.c, 0) AS c_cur
  FROM (SELECT unnest(range(10)) AS bin) s
  LEFT JOIN (SELECT bin, c FROM counts WHERE period = {ref_lit}) r USING (bin)
  LEFT JOIN (SELECT bin, c FROM counts WHERE period = {cur_lit}) k USING (bin)
),
tot AS (SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM pivoted),
contrib AS (
  SELECT t.n_ref, t.n_cur,
         round((greatest(p.c_ref / t.n_ref, 1e-6)
                - greatest(p.c_cur / t.n_cur, 1e-6))
               * ln(greatest(p.c_ref / t.n_ref, 1e-6)
                    / greatest(p.c_cur / t.n_cur, 1e-6)), 9) AS term
  FROM pivoted p CROSS JOIN tot t
)
SELECT round(SUM(term), 6) + 0.0 AS psi,
       round(SUM(term), 6) + 0.0 > 0.2 AS significant_shift,
       CAST(any_value(n_ref) AS BIGINT) AS n_ref,
       CAST(any_value(n_cur) AS BIGINT) AS n_cur
FROM contrib GROUP BY n_ref, n_cur
"""


def chi2_categorical(
    df: DataFrame,
    cat_col: str,
    period_col: str,
    ref_val: str,
    cur_val: str,
) -> DataFrame:
    """Two-sample chi-square statistic over a categorical column's
    contingency table (ref vs cur period) — the categorical counterpart
    of PSI/KS for drift on labels/types. χ² = Σ (O−E)²/E with
    E = row_total·col_total/N; dof = (k−1)·(2−1). One groupBy over one
    scan plus 2k-row reduces."""
    observed = (
        df.filter(F.col(period_col).isin([ref_val, cur_val]))
        .groupBy(cat_col, period_col)
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # full cat x period spine (r6, ADVICE r5): a category present in only
    # one period still contributes (0-E)^2/E = E for its empty cell —
    # omitting those cells understates chi2 exactly in the strongest-drift
    # case (a category appearing or vanishing). Periods <= 2 rows,
    # categories are the small drift dimension -> broadcast cross.
    spine = (
        observed.select(cat_col)
        .distinct()
        .crossJoin(F.broadcast(observed.select(period_col).distinct()))
    )
    counts = spine.join(observed, [cat_col, period_col], "left").fillna(
        0, subset=["o"]
    )
    cat_tot = counts.groupBy(cat_col).agg(F.sum("o").alias("cat_tot"))
    per_tot = counts.groupBy(period_col).agg(F.sum("o").alias("per_tot"))
    grand = counts.agg(F.sum("o").cast("double").alias("n"))
    cells = (
        counts.join(cat_tot, cat_col)
        .join(F.broadcast(per_tot), period_col)
        .crossJoin(F.broadcast(grand))
        .select(
            cat_col,
            F.round(
                F.pow(
                    F.col("o")
                    - F.col("cat_tot") * F.col("per_tot") / F.col("n"),
                    F.lit(2.0),
                )
                / (F.col("cat_tot") * F.col("per_tot") / F.col("n")),
                9,
            ).alias("term"),
            "n",
        )
    )
    k = cells.select(cat_col).distinct().count()
    return cells.groupBy("n").agg(
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("chi2"),
        F.lit(k - 1).cast("long").alias("dof"),
    ).select("chi2", "dof", F.col("n").cast("long").alias("n_events"))


def chi2_categorical_sql(
    table_expr: str, cat_col: str, period_col: str, ref_lit: str, cur_lit: str
) -> str:
    """DuckDB oracle for :func:`chi2_categorical`."""
    return f"""
WITH src AS (SELECT * FROM {table_expr}
             WHERE {period_col} IN ({ref_lit}, {cur_lit})),
observed AS (
  SELECT {cat_col} AS cat, {period_col} AS period, COUNT(*) AS o
  FROM src GROUP BY 1, 2
),
counts AS (  -- full cat x period spine: empty cells contribute (0-E)^2/E
  SELECT s.cat, s.period, COALESCE(ob.o, 0) AS o
  FROM (SELECT cat, period
        FROM (SELECT DISTINCT cat FROM observed)
        CROSS JOIN (SELECT DISTINCT period FROM observed)) s
  LEFT JOIN observed ob USING (cat, period)
),
cat_tot AS (SELECT cat, SUM(o) AS cat_tot FROM counts GROUP BY cat),
per_tot AS (SELECT period, SUM(o) AS per_tot FROM counts GROUP BY period),
grand AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM counts),
cells AS (
  SELECT c.cat,
         round(pow(c.o - ct.cat_tot * pt.per_tot / g.n, 2.0)
               / (ct.cat_tot * pt.per_tot / g.n), 9) AS term,
         g.n
  FROM counts c
  JOIN cat_tot ct USING (cat)
  JOIN per_tot pt USING (period)
  CROSS JOIN grand g
)
SELECT round(SUM(term), 6) + 0.0 AS chi2,
       CAST((SELECT COUNT(DISTINCT cat) FROM cells) - 1 AS BIGINT) AS dof,
       CAST(any_value(n) AS BIGINT) AS n_events
FROM cells GROUP BY n
"""
