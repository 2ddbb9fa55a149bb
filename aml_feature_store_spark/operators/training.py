"""Distributed model training + the automatic retrain decision (reference
models/advanced_models.py:462-533, feedback/feedback_system.py:241-273).

Training uses Spark MLlib's LogisticRegression — gradients are
tree-aggregated across executors, so the same code trains on 150 rows or
100 TB of feature rows without a collect. (The reference trains sklearn/
XGBoost in-driver on pandas; MLlib is the Spark-native re-expression.
Its fitted model also persists via ``model.write().save(path)``, which is
the engine's model-artifact answer to the reference's joblib store.)

The retrain decision mirrors ModelRetrainer.should_retrain
(feedback_system.py:241-273) rule-for-rule with its thresholds:
insufficient feedback (< 100) → no; AUC degradation > 0.05 between the
older and recent windows (each ≥ 20 samples) → yes; feedback accuracy
< 0.85 → yes; > 30 days since training → yes; else no.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .drift import binary_auc_by

RETRAIN_MIN_FEEDBACK = 100
RETRAIN_MIN_WINDOW = 20
RETRAIN_AUC_DEGRADATION = 0.05
RETRAIN_MIN_ACCURACY = 0.85
RETRAIN_MAX_AGE_DAYS = 30


def train_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    max_iter: int = 25,
    reg_param: float = 0.0,
):
    """Fit MLlib logistic regression on a feature DataFrame; returns
    (model, summary_df) where summary_df has one (feature, coefficient)
    row per feature plus '__intercept__' and the train ROC AUC."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features"
    ).transform(
        df.withColumn("label", F.col(label_col).cast("double")).na.fill(
            0, feature_cols
        )
    )
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    ).fit(assembled)
    auc = float(model.summary.areaUnderROC)
    spark = df.sparkSession
    rows = [
        (name, float(coef), auc)
        for name, coef in zip(feature_cols, model.coefficients)
    ] + [("__intercept__", float(model.intercept), auc)]
    summary = spark.createDataFrame(
        rows, "feature string, coefficient double, train_auc double"
    )
    return model, summary


def retrain_decision(
    feedback: DataFrame,
    score_col: str = "predicted_score",
    pred_label_col: str = "predicted_label",
    actual_label_col: str = "actual_label",
    period_col: str = "period",
    ts_col: str = "ts",
) -> DataFrame:
    """One-row retrain verdict over a feedback frame already split into
    'older'/'recent' periods. Rule order and thresholds are the
    reference's (feedback_system.py:241-273); all metrics are exact
    (integer counts, rank-exact AUC), so the verdict is oracle-checkable.
    """
    per = binary_auc_by(feedback, score_col, actual_label_col, period_col)
    aucs = per.agg(
        F.max(F.when(F.col(period_col) == "older", F.col("auc"))).alias(
            "older_auc"
        ),
        F.max(F.when(F.col(period_col) == "recent", F.col("auc"))).alias(
            "recent_auc"
        ),
    )
    correct = F.when(
        F.col(pred_label_col) == F.col(actual_label_col), 1
    ).otherwise(0)
    stats = feedback.agg(
        F.count(F.when(F.col(period_col) == "recent", 1)).alias("n_recent"),
        F.count(F.when(F.col(period_col) == "older", 1)).alias("n_older"),
        (
            F.sum(F.when(F.col(period_col) == "recent", correct)).cast("double")
            / F.count(F.when(F.col(period_col) == "recent", 1)).cast("double")
        ).alias("feedback_accuracy"),
        F.datediff(F.to_date(F.max(ts_col)), F.to_date(F.min(ts_col)))
        .cast("long")
        .alias("days_since_training"),
    )
    j = stats.join(aucs)
    degradation = (F.col("older_auc") - F.col("recent_auc")).alias(
        "auc_degradation"
    )
    drift_arm: Column = (
        (F.col("n_recent") >= RETRAIN_MIN_WINDOW)
        & (F.col("n_older") >= RETRAIN_MIN_WINDOW)
        & ((F.col("older_auc") - F.col("recent_auc")) > RETRAIN_AUC_DEGRADATION)
    )
    reason = (
        F.when(
            F.col("n_recent") < RETRAIN_MIN_FEEDBACK, F.lit("insufficient_feedback")
        )
        .when(drift_arm, F.lit("performance_drift"))
        .when(
            F.col("feedback_accuracy") < RETRAIN_MIN_ACCURACY, F.lit("low_accuracy")
        )
        .when(
            F.col("days_since_training") > RETRAIN_MAX_AGE_DAYS,
            F.lit("scheduled_retraining"),
        )
        .otherwise(F.lit("no_retraining_needed"))
    )
    should = reason.isin("performance_drift", "low_accuracy", "scheduled_retraining")
    return j.select(
        should.alias("should_retrain"),
        reason.alias("reason"),
        "n_recent",
        "n_older",
        "older_auc",
        "recent_auc",
        degradation,
        "feedback_accuracy",
        "days_since_training",
    )


def retrain_decision_sql(feedback_sql: str) -> str:
    """DuckDB mirror of :func:`retrain_decision` over a feedback relation
    providing (predicted_score, predicted_label, actual_label, period, ts)."""
    from .drift import binary_auc_by_sql

    auc_sql = binary_auc_by_sql(
        "SELECT * FROM fb", "predicted_score", "actual_label", "period"
    )
    return f"""
WITH fb AS ({feedback_sql}),
per AS ({auc_sql}),
aucs AS (
  SELECT MAX(CASE WHEN g = 'older' THEN auc END) AS older_auc,
         MAX(CASE WHEN g = 'recent' THEN auc END) AS recent_auc
  FROM per
),
stats AS (
  SELECT
    COUNT(CASE WHEN period = 'recent' THEN 1 END) AS n_recent,
    COUNT(CASE WHEN period = 'older' THEN 1 END) AS n_older,
    CAST(SUM(CASE WHEN period = 'recent'
                  AND predicted_label = actual_label THEN 1 ELSE 0 END) AS DOUBLE)
      / CAST(COUNT(CASE WHEN period = 'recent' THEN 1 END) AS DOUBLE)
      AS feedback_accuracy,
    CAST(datediff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS BIGINT)
      AS days_since_training
  FROM fb
),
j AS (SELECT * FROM stats CROSS JOIN aucs),
verdict AS (
  SELECT *,
    CASE
      WHEN n_recent < {RETRAIN_MIN_FEEDBACK} THEN 'insufficient_feedback'
      WHEN n_recent >= {RETRAIN_MIN_WINDOW} AND n_older >= {RETRAIN_MIN_WINDOW}
           AND (older_auc - recent_auc) > {RETRAIN_AUC_DEGRADATION}
        THEN 'performance_drift'
      WHEN feedback_accuracy < {RETRAIN_MIN_ACCURACY} THEN 'low_accuracy'
      WHEN days_since_training > {RETRAIN_MAX_AGE_DAYS} THEN 'scheduled_retraining'
      ELSE 'no_retraining_needed'
    END AS reason
  FROM j
)
SELECT reason IN ('performance_drift', 'low_accuracy', 'scheduled_retraining')
         AS should_retrain,
       reason, n_recent, n_older, older_auc, recent_auc,
       older_auc - recent_auc AS auc_degradation,
       feedback_accuracy, days_since_training
FROM verdict
"""
