"""Registered queries: the full online-serving path (SURVEY §3 EP2) —
request-batch scoring with zero-defaults for unknown entities (J1 + P6)
and top-3 feature-contribution explanations (W3/O3, D1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import register
from ..functions.risk import RISK_WEIGHTS
from ..operators import explain
from .joins_scoring import _ONLINE_FEATURES_SQL, _online_features, risk_score

N_REQUESTS = 200  # request user_ids 0..199; users ≥150 are unknown at sf0.01


@register(
    "batch_score_requests",
    oracle=f"""
WITH feats AS ({_ONLINE_FEATURES_SQL.strip()}),
req AS (SELECT CAST(r.range AS BIGINT) AS user_id FROM range(0, {N_REQUESTS}) r),
joined AS (
  SELECT q.user_id,
    COALESCE(f.txn_count_1h, 0) AS txn_count_1h,
    COALESCE(f.txn_amount_sum_1h, 0.0) AS txn_amount_sum_1h,
    COALESCE(f.velocity_score_1h, 0.0) AS velocity_score_1h,
    COALESCE(f.unique_event_type_1h, 0) AS unique_event_type_1h,
    COALESCE(f.night_txn_count_24h, 0) AS night_txn_count_24h,
    COALESCE(f.night_txn_ratio_24h, 0.0) AS night_txn_ratio_24h,
    f.user_id IS NOT NULL AS features_found
  FROM req q LEFT JOIN feats f ON q.user_id = f.user_id
)
SELECT user_id, features_found,
  LEAST(GREATEST(
      (LEAST(txn_amount_sum_1h / 10000.0, 1.0) * 0.25
       + LEAST(txn_count_1h / 10.0, 1.0) * 0.2
       + LEAST(velocity_score_1h / 2.0, 1.0) * 0.2
       + LEAST(unique_event_type_1h / 5.0, 1.0) * 0.15
       + LEAST(night_txn_ratio_24h / 1.0, 1.0) * 0.2)
      + ((CASE WHEN txn_amount_sum_1h > 10000.0 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN velocity_score_1h > 1.5 THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN night_txn_count_24h > 3.0 THEN 0.1 ELSE 0.0 END)),
      0.0), 1.0) AS risk_score
FROM joined
""",
)
def batch_score_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online inference for a request batch (EP2): requests ⋖ online
    features (broadcast left lookup join, J1) with the reference's
    zero-defaults for entities missing from the store
    (api/main.py:345-361, P6), then the rule model. Unknown users score
    0 / LOW instead of failing."""
    feats = _online_features(spark, sf_dir)
    req = spark.range(N_REQUESTS).select(F.col("id").alias("user_id"))
    joined = req.join(F.broadcast(feats), "user_id", "left")
    defaults = {
        "txn_count_1h": 0,
        "txn_amount_sum_1h": 0.0,
        "velocity_score_1h": 0.0,
        "unique_event_type_1h": 0,
        "night_txn_count_24h": 0,
        "night_txn_ratio_24h": 0.0,
    }
    filled = joined.withColumn(
        "features_found", F.col("txn_count_1h").isNotNull()
    ).na.fill(defaults)
    return risk_score(filled).select("user_id", "features_found", "risk_score")


@register(
    "risk_explanations",
    oracle=f"""
WITH feats AS ({_ONLINE_FEATURES_SQL.strip()}),
contrib AS (
  SELECT user_id, 'txn_amount_sum_1h' AS feature,
         LEAST(txn_amount_sum_1h / 10000.0, 1.0) * 0.25 AS contribution FROM feats
  UNION ALL
  SELECT user_id, 'txn_count_1h', LEAST(txn_count_1h / 10.0, 1.0) * 0.2 FROM feats
  UNION ALL
  SELECT user_id, 'velocity_score_1h', LEAST(velocity_score_1h / 2.0, 1.0) * 0.2 FROM feats
  UNION ALL
  SELECT user_id, 'unique_event_type_1h', LEAST(unique_event_type_1h / 5.0, 1.0) * 0.15 FROM feats
  UNION ALL
  SELECT user_id, 'night_txn_ratio_24h', LEAST(night_txn_ratio_24h / 1.0, 1.0) * 0.2 FROM feats
)
SELECT user_id, feature, contribution, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY contribution DESC, feature) AS rk
  FROM contrib
) WHERE rk <= 3
""",
)
def risk_explanations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 feature contributions per entity (the explanation payload of
    the serving API, api/main.py:211-241): unpivot the weighted
    normalized terms → per-entity top-k window (W3) — explanations as
    data, no UDF, no string formatting divergence."""
    feats = _online_features(spark, sf_dir)
    contribs = [
        F.struct(
            F.lit(col).alias("feature"),
            (F.least(F.col(col) / F.lit(thr), F.lit(1.0)) * F.lit(w)).alias(
                "contribution"
            ),
        )
        for col, thr, w in RISK_WEIGHTS
    ]
    unpivoted = feats.select(
        "user_id", F.explode(F.array(*contribs)).alias("_c")
    ).select("user_id", F.col("_c.feature").alias("feature"),
             F.col("_c.contribution").alias("contribution"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("contribution").desc(), F.col("feature")
    )
    return (
        unpivoted.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("user_id", "feature", "contribution", "rk")
    )


@register(
    "risk_shapley",
    oracle=explain.shapley_linear_sql(_ONLINE_FEATURES_SQL.strip()),
)
def risk_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley attributions for the rule model per entity (D6;
    reference explainability/shap_explainer.py:78-126): the pre-clamp
    margin is additively separable, so phi_i = h_i(x_i) - E[h_i] exactly.
    Arrow-batched mapInPandas kernel — the same plumbing a library SHAP
    explainer drops into — over a broadcast 1-row population-mean join."""
    return explain.shapley_linear(_online_features(spark, sf_dir))
