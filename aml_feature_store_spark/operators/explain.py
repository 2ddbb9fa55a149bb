"""SHAP-style per-feature attributions for the rule risk model (D6).

The reference wraps a TreeExplainer around its fitted model
(reference: explainability/shap_explainer.py:78-126) and serves
per-feature contribution rows. The engine's serving model is the linear
rule score (functions/risk.py): its pre-clamp margin is additively
separable — every weighted term and every rule bump is a function of a
single feature — so exact Shapley values have the closed form

    phi_i(x) = h_i(x_i) - E[h_i(X_i)]        (background = population)

where h_i collects the weighted normalized term plus any rule bump on
feature i, and sum_i phi_i = margin(x) - E[margin] exactly (the clamp to
[0,1] is outside the attribution, as in explaining a linear predictor).

Execution shape: the per-feature population means are a 1-row Spark
aggregate broadcast onto the feature rows; the attribution kernel is an
Arrow-batched ``mapInPandas`` — deliberately, because that is the exact
plumbing a library explainer needs (swap ``_margin_terms``'s closed form
for ``explainer.shap_values(batch)`` and nothing else changes). Final
values are rounded to 6 dp on both engine and oracle (the population
mean is an order-dependent double sum; same contract as the
entropy/stddev family).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.risk import RISK_WEIGHTS, RULES


def _features() -> list[str]:
    """Union of weighted and rule-only features, weight order first."""
    feats = [col for col, _, _ in RISK_WEIGHTS]
    for col, _, _ in RULES:
        if col not in feats:
            feats.append(col)
    return feats


def _margin_terms(pdf: pd.DataFrame) -> dict[str, np.ndarray]:
    """h_i(x_i) per feature: weighted normalized term + rule bumps.

    Mirrors functions/risk.py term-for-term (same IEEE ops in the same
    order) so engine and oracle h_i are bit-identical per row.
    """
    h = {c: np.zeros(len(pdf)) for c in _features()}
    for col, thr, w in RISK_WEIGHTS:
        x = pdf[col].to_numpy(dtype=np.float64)
        h[col] = h[col] + np.minimum(x / thr, 1.0) * w
    for col, thr, bump in RULES:
        x = pdf[col].to_numpy(dtype=np.float64)
        h[col] = h[col] + np.where(x > thr, bump, 0.0)
    return h


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("feature", T.StringType()),
        T.StructField("phi", T.DoubleType()),
        T.StructField("base_value", T.DoubleType()),
    ]
)


def shapley_linear(feats: DataFrame, entity_col: str = "user_id") -> DataFrame:
    """Exact Shapley attribution rows (entity, feature, phi, base_value)
    for the rule model over a feature DataFrame."""
    names = _features()
    mean_cols = {f"_mu_{c}": F.avg(f"_h_{c}") for c in names}
    with_h = feats
    # build h_i columns relationally once so the SAME expressions feed both
    # the population means and (via the kernel) the attributions
    for col, thr, w in RISK_WEIGHTS:
        with_h = with_h.withColumn(
            f"_h_{col}", F.least(F.col(col) / F.lit(thr), F.lit(1.0)) * F.lit(w)
        )
    for col, thr, bump in RULES:
        base = F.col(f"_h_{col}") if f"_h_{col}" in with_h.columns else F.lit(0.0)
        with_h = with_h.withColumn(
            f"_h_{col}",
            base + F.when(F.col(col) > thr, F.lit(bump)).otherwise(F.lit(0.0)),
        )
    means = with_h.agg(*[expr.alias(name) for name, expr in mean_cols.items()])
    joined = feats.join(F.broadcast(means))

    def explain(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = _margin_terms(pdf)
            base = np.zeros(len(pdf))
            for c in names:
                base = base + pdf[f"_mu_{c}"].to_numpy(dtype=np.float64)
            out = []
            for c in names:
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": pdf[entity_col],
                            "feature": c,
                            "phi": h[c] - pdf[f"_mu_{c}"].to_numpy(np.float64),
                            "base_value": base,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    raw = joined.mapInPandas(explain, schema=_OUT_SCHEMA)
    return raw.select(
        "user_id",
        "feature",
        # + 0.0: ROUND of a tiny-negative phi gives -0.0 in DuckDB but +0.0
        # in Spark; normalize the signed zero on both sides
        (F.round("phi", 6) + F.lit(0.0)).alias("phi"),
        F.round("base_value", 6).alias("base_value"),
    )


def shapley_linear_sql(feature_source: str, entity: str = "user_id") -> str:
    """DuckDB mirror of :func:`shapley_linear`."""
    names = _features()
    h_expr: dict[str, list[str]] = {c: [] for c in names}
    for col, thr, w in RISK_WEIGHTS:
        h_expr[col].append(f"LEAST({col} / {thr}, 1.0) * {w}")
    for col, thr, bump in RULES:
        h_expr[col].append(f"(CASE WHEN {col} > {thr} THEN {bump} ELSE 0.0 END)")
    h_cols = ",\n  ".join(
        f"({' + '.join(terms)}) AS h_{c}" for c, terms in h_expr.items()
    )
    mu_cols = ", ".join(f"AVG(h_{c}) AS mu_{c}" for c in names)
    base = " + ".join(f"mu_{c}" for c in names)
    arms = "\n  UNION ALL\n  ".join(
        f"SELECT {entity} AS user_id, '{c}' AS feature, "
        f"ROUND(h_{c} - mu_{c}, 6) + 0.0 AS phi, ROUND({base}, 6) AS base_value "
        "FROM joined"
        for c in names
    )
    return f"""
WITH feats AS ({feature_source}),
h AS (
  SELECT {entity},
  {h_cols}
  FROM feats
), mu AS (
  SELECT {mu_cols} FROM h
), joined AS (
  SELECT * FROM h CROSS JOIN mu
)
{arms}
"""
