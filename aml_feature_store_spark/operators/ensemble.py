"""Ensemble + anomaly-detector training, Spark-native (SURVEY §2.10 D5
adjacents; reference: models/advanced_models.py:215-307 EnsembleModels,
:107-143 autoencoder anomaly detector).

Re-expression decisions:
- **Stacking** (reference :247-295, sklearn 5-fold StratifiedKFold loop):
  base learners are MLlib estimators (distributed fits); out-of-fold
  meta-features come from a DETERMINISTIC hash fold assignment
  (pmod(xxhash64(entity), k)) — the same row lands in the same fold on
  any cluster size, so training is reproducible without a driver-side
  index split. For each fold, base models train on the other k−1 folds
  and score the held-out fold; the unioned out-of-fold scores train the
  logistic meta-model. Every fit/transform is an MLlib distributed job —
  no pandas, no .collect() of features.
- **Voting** (reference :224-246): soft voting = row-wise mean of base
  probabilities — a column expression over the scored frame.
- **Autoencoder anomaly detector** (reference :107-143, Keras 3-layer
  autoencoder): re-expressed as PCA reconstruction error — the optimal
  linear autoencoder IS the PCA subspace, and MLlib PCA is a distributed
  covariance eigendecomposition. score(x) = ||x_c − V_k V_kᵀ x_c||² with
  the (d × k) component matrix broadcast into an Arrow-batched kernel.
  The nonlinear Keras variant needs a DL runtime this container doesn't
  ship; the linear detector is the honest distributed analog and is
  property-tested (k = d ⇒ error ≈ 0; errors monotone non-increasing in
  k; matches numpy on the same data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F



def _assemble(df: DataFrame, feature_cols: list[str], label_col: str | None):
    from pyspark.ml.feature import VectorAssembler

    out = df.na.fill(0, feature_cols)
    if label_col is not None:
        out = out.withColumn("label", F.col(label_col).cast("double"))
    return VectorAssembler(inputCols=feature_cols, outputCol="features").transform(
        out
    )


def _base_learners(seed: int):
    from pyspark.ml.classification import (
        GBTClassifier,
        LogisticRegression,
        RandomForestClassifier,
    )

    return [
        ("lr", LogisticRegression(maxIter=25)),
        ("gbt", GBTClassifier(maxIter=10, maxDepth=3, seed=seed)),
        ("rf", RandomForestClassifier(numTrees=20, maxDepth=5, seed=seed)),
    ]


def _p1(scored: DataFrame, name: str) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        f"p_{name}", vector_to_array("probability")[1].cast("double")
    ).drop("rawPrediction", "probability", "prediction")


def train_voting(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    entity_col: str = "user_id",
    seed: int = 7,
) -> DataFrame:
    """Soft-voting ensemble (advanced_models.py:224-246): every base
    learner fits distributed on the full frame; the ensemble score is the
    row-wise mean of their probabilities. Returns one row per entity:
    (entity, p_<base>..., p_voting)."""
    assembled = _assemble(df, feature_cols, label_col).cache()
    out = assembled.select(entity_col, "features")
    names = []
    for name, est in _base_learners(seed):
        model = est.fit(assembled)
        out = _p1(model.transform(out), name)
        names.append(f"p_{name}")
    votes = sum(F.col(c) for c in names) / F.lit(float(len(names)))
    return out.select(entity_col, *names, votes.alias("p_voting"))


def train_stacking(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    entity_col: str = "user_id",
    n_folds: int = 5,
    seed: int = 7,
    fold_expr=None,
):
    """Out-of-fold stacking (advanced_models.py:247-295) with MLlib base
    learners and deterministic hash folds. Returns (meta_model,
    scores_df) where scores_df has one row per entity:
    (entity, fold, p_<base>... out-of-fold, p_stacking).

    The held-out scores feeding the meta-model are genuinely out-of-fold
    (the base model never saw that row), so the meta-model's input
    distribution matches serving — the property the reference's CV loop
    exists for, preserved under distributed execution.

    ``fold_expr`` (r11): optional Column overriding the default
    pmod(xxhash64(entity), k) fold assignment. The stacking oracle
    passes pmod(entity, k) — equally deterministic, but recomputable by
    DuckDB so fold MEMBERSHIP itself is oracle-certified.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    if fold_expr is None:
        fold_expr = F.pmod(F.xxhash64(F.col(entity_col)), F.lit(n_folds))
    assembled = _assemble(df, feature_cols, label_col).withColumn(
        "fold", fold_expr
    )
    assembled = assembled.cache()
    names = [n for n, _ in _base_learners(seed)]
    oof = None
    for f in range(n_folds):
        train = assembled.filter(F.col("fold") != f)
        held = assembled.select(entity_col, "fold", "label", "features").filter(
            F.col("fold") == f
        )
        for name, est in _base_learners(seed):
            model = est.fit(train)
            held = _p1(model.transform(held), name)
        held = held.drop("features")
        oof = held if oof is None else oof.unionByName(held)
    oof = oof.cache()
    meta_in = VectorAssembler(
        inputCols=[f"p_{n}" for n in names], outputCol="meta_features"
    ).transform(oof)
    meta_model = LogisticRegression(
        maxIter=25, featuresCol="meta_features"
    ).fit(meta_in)
    scored = meta_model.transform(meta_in)
    scores = _p1(scored, "stacking_raw").select(
        entity_col,
        "fold",
        *[f"p_{n}" for n in names],
        F.col("p_stacking_raw").alias("p_stacking"),
    )
    return meta_model, scores


def pca_anomaly_scores(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 2,
    entity_col: str = "user_id",
) -> DataFrame:
    """Linear-autoencoder anomaly detector (advanced_models.py:107-143
    re-expressed): distributed MLlib PCA on the standardized features,
    anomaly score = squared reconstruction error off the k-dim principal
    subspace. Components (d × k) and means/stds are driver-side metadata
    broadcast into an Arrow-batched mapInPandas kernel — the feature
    table itself never leaves the executors. Returns (entity,
    reconstruction_error) rows."""
    import numpy as np
    import pandas as pd

    from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="_raw"
    ).transform(df.na.fill(0, feature_cols))
    scaler = StandardScaler(
        inputCol="_raw", outputCol="features", withMean=True, withStd=True
    ).fit(assembled)
    scaled = scaler.transform(assembled)
    model = PCA(k=k, inputCol="features", outputCol="_pc").fit(scaled)
    V = np.array(model.pc.toArray())  # d x k, driver-side metadata
    mean = np.array(scaler.mean.toArray())
    std = np.array(scaler.std.toArray())
    std[std == 0.0] = 1.0
    names = list(feature_cols)
    schema = f"{entity_col} long, reconstruction_error double"

    def kernel(batches):
        for pdf in batches:
            x = pdf[names].fillna(0).to_numpy(np.float64)
            xc = (x - mean) / std
            proj = xc @ V
            resid = xc - proj @ V.T
            yield pd.DataFrame(
                {
                    entity_col: pdf[entity_col],
                    "reconstruction_error": (resid * resid).sum(axis=1),
                }
            )

    return df.na.fill(0, names).select(entity_col, *names).mapInPandas(
        kernel, schema=schema
    )
