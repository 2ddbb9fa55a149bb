"""Registered queries: drift/model-eval, sessionization, DBSCAN outliers,
feature-target correlation, clustering coefficient, embedding near-dup,
pandas-UDF batch scoring (SURVEY §2.4 A24/A26/A28, §2.9 T10, §2.10 D3/D5/D7)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..functions.risk import risk_score_sql
from ..operators import drift, outliers, sessionize
from ..sources import load_table
from .joins_scoring import _ONLINE_FEATURES_SQL, _online_features, risk_score

DEC = "decimal(25,2)"

# --- D7: KS drift between first/second half of the month --------------------

_PERIOD = "CASE WHEN day(ts) <= 15 THEN 'ref' ELSE 'cur' END"


@register(
    "ks_drift_value",
    oracle=drift.ks_statistic_sql(
        f"(SELECT value, {_PERIOD} AS period FROM events)",
        "value",
        "period",
        "'ref'",
        "'cur'",
    ),
)
def ks_drift_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic of amount distribution, days 1-15 vs 16-31
    (D7 feature drift; reference feedback_system.py:204-229 scipy ks_2samp
    → empirical-CDF window computation, no scipy)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "period", F.when(F.dayofmonth("ts") <= 15, "ref").otherwise("cur")
    )
    return drift.ks_statistic(ev, "value", "period", "ref", "cur")


# --- model evaluation: AUC + confusion metrics ------------------------------

_SCORED_SQL = risk_score_sql(_ONLINE_FEATURES_SQL.strip())
_LABEL = "night_txn_count_24h >= 1"


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return risk_score(_online_features(spark, sf_dir)).withColumn(
        "label", F.col("night_txn_count_24h") >= 1
    )


@register(
    "model_auc",
    oracle=drift.binary_auc_sql(_SCORED_SQL.strip(), "risk_score", _LABEL),
)
def model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the rule risk score against a held-out proxy label via
    the rank/Mann-Whitney formulation with tie-averaged ranks (reference:
    feedback_system.py:166-202 AUC drift check, sklearn-free)."""
    return drift.binary_auc(_scored(spark, sf_dir), "risk_score", "label")


@register(
    "model_eval_metrics",
    oracle=drift.classification_metrics_sql(
        _SCORED_SQL.strip(), "risk_score", _LABEL, threshold=0.5
    ),
)
def model_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts + precision/recall/F1/accuracy at threshold 0.5
    (the model_performance row of the feedback loop, S8)."""
    return drift.classification_metrics(
        _scored(spark, sf_dir), "risk_score", "label", threshold=0.5
    )


# --- T10: sessionization ----------------------------------------------------


@register("user_sessions", oracle=sessionize.sessionize_sql(gap_s=1800))
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization per user: lag + cumsum flags + session
    aggregates (T10; streaming twin = session_window)."""
    return sessionize.sessionize(load_table(spark, sf_dir, "events"), gap_s=1800)


_SESSION_WINDOW_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
    CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
           (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
         >= 1800000 THEN 1 ELSE 0 END AS newf
  FROM events
), sess AS (
  SELECT *, SUM(newf) OVER (PARTITION BY user_id ORDER BY ms, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS sid
  FROM flagged
)
SELECT user_id, MIN(ms) AS session_start_ms,
  MAX(ms) + 1800000 AS session_end_ms,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
"""


@register("session_window_rollup", oracle=_SESSION_WINDOW_ORACLE)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native session windows (T10's built-in form, usable
    identically under readStream): groupBy(session_window(ts, 30 min),
    user) aggregates. NOTE the boundary semantics difference vs the
    lag/cumsum sessionizer: session_window opens a NEW session when the
    inter-event gap is >= the gap (adjacent half-open windows do not
    overlap), while user_sessions splits only when strictly greater —
    the oracle here mirrors the >= contract."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


# --- A26/D3: DBSCAN outliers (not SQL-expressible → rows-only) --------------


@register("dbscan_outlier_features", oracle=None)
def dbscan_outlier_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user DBSCAN outlier ratio + cluster count on standardized
    (amount, hour) via applyInPandas + numpy DBSCAN (A26/D3). Rows-only:
    iterative algorithm; semantics pinned by unit tests."""
    return outliers.dbscan_outlier_features(load_table(spark, sf_dir, "events"))


@register(
    "dbscan_outliers_sliced",
    oracle=r"""
WITH RECURSIVE
sl AS (
  SELECT user_id, event_id, value/50.0 AS z1, hour(ts)/4.0 AS z2
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
  WHERE rn <= 64
),
pairs AS (
  SELECT a.user_id, a.event_id AS i, b.event_id AS j
  FROM sl a JOIN sl b ON a.user_id = b.user_id
  WHERE (a.z1-b.z1)*(a.z1-b.z1) + (a.z2-b.z2)*(a.z2-b.z2) <= 0.25
),
core AS (SELECT user_id, i AS id FROM pairs GROUP BY user_id, i HAVING COUNT(*) >= 5),
core_edges AS (
  SELECT p.user_id, p.i AS src, p.j AS dst
  FROM pairs p
  JOIN core c1 ON c1.user_id = p.user_id AND c1.id = p.i
  JOIN core c2 ON c2.user_id = p.user_id AND c2.id = p.j
),
reach(user_id, node, lab) AS (
  SELECT user_id, id, id FROM core
  UNION
  SELECT e.user_id, e.dst, r.lab
  FROM reach r JOIN core_edges e ON e.user_id = r.user_id AND e.src = r.node
),
comp AS (SELECT user_id, node, MIN(lab) AS comp FROM reach GROUP BY user_id, node),
withcore AS (
  SELECT DISTINCT p.user_id, p.i AS id
  FROM pairs p JOIN core c ON c.user_id = p.user_id AND c.id = p.j
),
stats AS (SELECT user_id, COUNT(*) AS n_points FROM sl GROUP BY user_id),
nclus AS (SELECT user_id, COUNT(DISTINCT comp) AS n_clusters FROM comp GROUP BY user_id),
noise AS (
  SELECT s.user_id, COUNT(*) AS n_noise
  FROM sl s
  WHERE NOT EXISTS (SELECT 1 FROM withcore w WHERE w.user_id = s.user_id AND w.id = s.event_id)
  GROUP BY s.user_id
)
SELECT st.user_id,
  CAST(st.n_points AS BIGINT) AS n_points,
  CAST(CASE WHEN st.n_points < 5 THEN 0 ELSE COALESCE(nc.n_clusters, 0) END AS BIGINT) AS n_clusters,
  CASE WHEN st.n_points < 5 THEN 0.0
       ELSE CAST(COALESCE(no.n_noise, 0) AS DOUBLE) / st.n_points END AS outlier_ratio
FROM stats st
LEFT JOIN nclus nc USING (user_id)
LEFT JOIN noise no USING (user_id)
""",
)
def dbscan_outliers_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED DBSCAN (A26/D3): cluster count + noise ratio per
    user over each user's first 64 events (ts, event_id order) on fixed-
    scale (value/50, hour/4) coordinates, eps=0.5, min_samples=5. The
    DuckDB oracle mirrors the full algorithm — eps-neighbor self-join,
    core-point predicate, WITH RECURSIVE reachability closure over the
    core-core graph for cluster count, no-core-neighbor noise test — on
    the identical IEEE expression tree, so cluster counts and noise
    ratios are bit-exact across engines. The production variant
    (dbscan_outlier_features, per-group standardization, unbounded slice)
    stays rows-only by declared design; this query driver-certifies the
    DBSCAN semantics themselves. Reference: advanced_features.py:274-297."""
    from pyspark.sql import Window

    from ..operators.outliers import dbscan_cluster_stats

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sl = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .select(
            "user_id",
            (F.col("value") / F.lit(50.0)).alias("z1"),
            (F.hour("ts") / F.lit(4.0)).alias("z2"),
        )
    )
    return dbscan_cluster_stats(sl, eps=0.5, min_samples=5)


# --- A24: feature-target correlation ----------------------------------------


@register(
    "feature_target_correlation",
    oracle="""
WITH s AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(value AS DECIMAL(25,2))) AS sx,
    SUM(CAST(value * value AS DECIMAL(30,4))) AS sx2,
    SUM(CAST(hour(ts) AS BIGINT)) AS sh,
    SUM(CAST(hour(ts) * hour(ts) AS BIGINT)) AS sh2,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS sy,
    SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(25,2)) ELSE 0 END) AS sxy,
    SUM(CASE WHEN event_type = 'purchase' THEN CAST(hour(ts) AS BIGINT) ELSE 0 END) AS shy
  FROM events
)
SELECT
  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (SQRT(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
     * SQRT(CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
    AS corr_value_target,
  (CAST(n AS DOUBLE) * CAST(shy AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sy AS DOUBLE))
  / (SQRT(CAST(n AS DOUBLE) * CAST(sh2 AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE))
     * SQRT(CAST(n AS DOUBLE) * CAST(sy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
    AS corr_hour_target
FROM s
""",
)
def feature_target_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of (amount, hour) with the purchase indicator
    from exact power sums — the notebook's corrwith(target) (A24; binary
    y ⇒ Σy² = Σy)."""
    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    h = F.hour("ts").cast("long")
    s = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,4)")).alias("sx2"),
        F.sum(h).alias("sh"),
        F.sum(h * h).alias("sh2"),
        F.sum(y).alias("sy"),
        F.sum(F.when(y == 1, F.col("value").cast(DEC)).otherwise(F.lit(0).cast(DEC))).alias("sxy"),
        F.sum(F.when(y == 1, h).otherwise(0)).alias("shy"),
    )

    def d(c):
        return c.cast("double")

    n = d(F.col("n"))
    corr_v = (n * d(F.col("sxy")) - d(F.col("sx")) * d(F.col("sy"))) / (
        F.sqrt(n * d(F.col("sx2")) - d(F.col("sx")) * d(F.col("sx")))
        * F.sqrt(n * d(F.col("sy")) - d(F.col("sy")) * d(F.col("sy")))
    )
    corr_h = (n * d(F.col("shy")) - d(F.col("sh")) * d(F.col("sy"))) / (
        F.sqrt(n * d(F.col("sh2")) - d(F.col("sh")) * d(F.col("sh")))
        * F.sqrt(n * d(F.col("sy")) - d(F.col("sy")) * d(F.col("sy")))
    )
    return s.select(
        corr_v.alias("corr_value_target"), corr_h.alias("corr_hour_target")
    )


# --- A28: local clustering coefficient on the projected user graph ----------

_PAIRS_SQL = r"""
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM (SELECT DISTINCT user_id,
               CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        FROM events) a
  JOIN (SELECT DISTINCT user_id,
               CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        FROM events) b
    ON a.k = b.k AND a.user_id < b.user_id
"""


@register(
    "user_clustering_coeff",
    oracle=f"""
WITH p AS ({_PAIRS_SQL}),
e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
deg AS (SELECT u AS node, COUNT(*) AS degree FROM e GROUP BY u),
tri AS (
  SELECT t.node, COUNT(*) AS triangles FROM (
    SELECT p1.u AS node FROM p p1 JOIN p p2 ON p1.v = p2.u
      JOIN p p3 ON p3.u = p1.u AND p3.v = p2.v
    UNION ALL
    SELECT p1.v FROM p p1 JOIN p p2 ON p1.v = p2.u
      JOIN p p3 ON p3.u = p1.u AND p3.v = p2.v
    UNION ALL
    SELECT p2.v FROM p p1 JOIN p p2 ON p1.v = p2.u
      JOIN p p3 ON p3.u = p1.u AND p3.v = p2.v
  ) t GROUP BY t.node
)
SELECT d.node, d.degree,
  COALESCE(t.triangles, 0) AS triangles,
  CASE WHEN d.degree >= 2 THEN
    2.0 * CAST(COALESCE(t.triangles, 0) AS DOUBLE)
      / CAST(d.degree * (d.degree - 1) AS DOUBLE)
  ELSE 0.0 END AS clustering_coeff
FROM deg d LEFT JOIN tri t ON d.node = t.node
""",
)
def user_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per user on the shared-prop_k projected
    graph via triangle counting with edge self-joins (A28 — the
    decomposable part of the reference's networkx centralities; global
    betweenness/closeness stay out of scope by design)."""
    from ..schemas import prop_k_fast

    ev = load_table(spark, sf_dir, "events")
    uk = ev.select(
        "user_id", prop_k_fast().alias("k")
    ).distinct()
    a = uk.select(F.col("user_id").alias("u"), "k")
    b = uk.select(F.col("user_id").alias("v"), "k")
    p = (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    e = p.unionByName(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = e.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
    p1 = p.select(F.col("u").alias("a"), F.col("v").alias("b"))
    p2 = p.select(F.col("u").alias("b"), F.col("v").alias("c"))
    p3 = p.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = p1.join(p2, "b").join(p3, ["a", "c"])
    tri_nodes = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = deg.join(tri_nodes, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            F.lit(2.0) * F.coalesce("triangles", F.lit(0)).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )
    return out


# --- X3 adjunct: embedding near-duplicate pairs -----------------------------


@register(
    "embedding_near_dup_pairs",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
SELECT a.vec_id AS v1, b.vec_id AS v2,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 8) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 8) >= 0.4
""",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.4): the semantic-dedup
    companion to the lexical X2 ops. IVF-bucketed candidate generation
    with triangle-inequality-complete pruning — EXACT output (the oracle
    stays the all-pairs scan) with no cartesian in the plan; see
    operators.simsearch.near_dup_pairs_bucketed for the argument."""
    from ..operators.simsearch import near_dup_pairs_bucketed

    return near_dup_pairs_bucketed(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, n_centroids=8
    )


# --- D5: vectorized pandas-UDF batch scoring --------------------------------

_LOGIT_W = {"txn_count_1h": 0.3, "txn_amount_sum_1h": 0.0002,
            "night_txn_ratio_24h": 2.0}
_LOGIT_B = -2.0


@register(
    "pandas_udf_model_scores",
    oracle=f"""
SELECT user_id,
  ROUND(1.0 / (1.0 + EXP(-({_LOGIT_B}
    + txn_count_1h * {_LOGIT_W['txn_count_1h']}
    + txn_amount_sum_1h * {_LOGIT_W['txn_amount_sum_1h']}
    + night_txn_ratio_24h * {_LOGIT_W['night_txn_ratio_24h']}))), 6) AS model_score
FROM ({_ONLINE_FEATURES_SQL.strip()})
""",
)
def pandas_udf_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas-UDF model scoring (D5): stands in for
    sklearn/XGBoost predict_proba over feature batches — a fixed-weight
    logistic here so the oracle can verify the plumbing end-to-end."""

    @F.pandas_udf("double")
    def logit_score(cnt: pd.Series, amt: pd.Series, night: pd.Series) -> pd.Series:
        import numpy as np

        z = (
            _LOGIT_B
            + cnt * _LOGIT_W["txn_count_1h"]
            + amt * _LOGIT_W["txn_amount_sum_1h"]
            + night * _LOGIT_W["night_txn_ratio_24h"]
        )
        return (1.0 / (1.0 + np.exp(-z))).round(6)

    feats = _online_features(spark, sf_dir)
    return feats.select(
        "user_id",
        logit_score(
            F.col("txn_count_1h").cast("double"),
            "txn_amount_sum_1h",
            "night_txn_ratio_24h",
        ).alias("model_score"),
    )


@register(
    "psi_drift_value",
    oracle=drift.psi_sql(
        f"(SELECT value, {_PERIOD} AS period FROM events)",
        "value",
        "period",
        "'ref'",
        "'cur'",
    ),
)
def psi_drift_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the amount distribution, days 1-15
    vs 16-31 — the binned-decile drift score paired with the KS check
    (D7; reference feedback_system.py:204-229 has only KS — PSI is the
    standard production companion). Reference-decile broadcast edges,
    one scan, no window."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "period", F.when(F.dayofmonth("ts") <= 15, "ref").otherwise("cur")
    )
    return drift.psi(ev, "value", "period", "ref", "cur")


@register(
    "chi2_drift_event_type",
    oracle=drift.chi2_categorical_sql(
        f"(SELECT event_type, {_PERIOD} AS period FROM events)",
        "event_type",
        "period",
        "'ref'",
        "'cur'",
    ),
)
def chi2_drift_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample chi-square drift over the event-type distribution
    (categorical counterpart of PSI/KS, D7): contingency-table χ² with
    expected counts from the margins; one groupBy over one scan."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "period", F.when(F.dayofmonth("ts") <= 15, "ref").otherwise("cur")
    )
    return drift.chi2_categorical(ev, "event_type", "period", "ref", "cur")


@register(
    "model_calibration_bins",
    oracle=f"""
WITH scored AS ({_SCORED_SQL.strip()}),
binned AS (
  SELECT least(CAST(floor(risk_score * 10) AS INT), 9) AS score_bin,
         risk_score,
         CASE WHEN {_LABEL} THEN 1 ELSE 0 END AS y
  FROM scored
)
SELECT score_bin, COUNT(*) AS n,
       round(round(SUM(risk_score), 6) / COUNT(*), 6) + 0.0 AS mean_score,
       round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) + 0.0 AS frac_positive
FROM binned GROUP BY score_bin
""",
)
def model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-curve bins for the risk model: decile score buckets →
    (mean predicted score, observed positive rate) — the calibration
    check that belongs next to AUC/confusion in the feedback loop (D7;
    reference feedback_system.py stores accuracy only). A well-calibrated
    model has mean_score ≈ frac_positive per bin. One groupBy over the
    scored frame."""
    scored = _scored(spark, sf_dir)
    binned = scored.select(
        F.least(F.floor(F.col("risk_score") * 10).cast("int"), F.lit(9)).alias(
            "score_bin"
        ),
        "risk_score",
        F.col("label").cast("int").alias("y"),
    )
    return binned.groupBy("score_bin").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.round(
                F.round(F.sum("risk_score"), 6) / F.count(F.lit(1)), 6
            )
            + F.lit(0.0)
        ).alias("mean_score"),
        (
            F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6)
            + F.lit(0.0)
        ).alias("frac_positive"),
    )
