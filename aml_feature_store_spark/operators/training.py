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


def train_gbt(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    max_iter: int = 10,
    max_depth: int = 3,
    seed: int = 7,
):
    """Fit an MLlib gradient-boosted-trees classifier — the Spark-native
    re-expression of the reference's in-driver XGBoost/ensemble side
    (models/advanced_models.py:462-508): boosting iterations are
    distributed tree fits, so the same code trains on 150 rows or 100 TB
    of feature rows. Returns (model, summary_df) with one
    (feature, importance, train_auc) row per feature."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features"
    ).transform(
        df.withColumn("label", F.col(label_col).cast("double")).na.fill(
            0, feature_cols
        )
    )
    model = GBTClassifier(
        maxIter=max_iter, maxDepth=max_depth, seed=seed
    ).fit(assembled)
    auc = float(
        BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(
            model.transform(assembled)
        )
    )
    imps = model.featureImportances
    rows = [
        (name, float(imps[i]), auc) for i, name in enumerate(feature_cols)
    ]
    summary = df.sparkSession.createDataFrame(
        rows, "feature string, importance double, train_auc double"
    )
    return model, summary


def _extract_tree(java_node) -> dict:
    """Recursively extract a fitted MLlib tree into a plain nested dict
    (metadata-scale: ≤ 2^(depth+1) nodes). Continuous splits only — the
    engine's feature vectors are all numeric."""
    pred = float(java_node.prediction())
    if java_node.getClass().getSimpleName() == "LeafNode":
        return {"pred": pred}
    split = java_node.split()
    if split.getClass().getSimpleName() != "ContinuousSplit":
        raise NotImplementedError(
            "path attribution supports continuous splits only"
        )
    return {
        "pred": pred,
        "feat": int(split.featureIndex()),
        "thr": float(split.threshold()),
        "left": _extract_tree(java_node.leftChild()),
        "right": _extract_tree(java_node.rightChild()),
    }


def gbt_trees(model) -> list[tuple[float, dict]]:
    """(weight, tree_dict) per boosting stage of a fitted GBT model."""
    return [
        (float(w), _extract_tree(t._java_obj.rootNode()))
        for w, t in zip(model.treeWeights, model.trees)
    ]


def gbt_path_contributions_per_tree(
    feats: DataFrame,
    model,
    feature_cols: list[str],
    entity_col: str = "user_id",
) -> DataFrame:
    """Per-(entity, boosting-stage, feature) Saabas attribution on the
    1e-9 integer lattice — the EXPORT surface behind the value-recomputing
    oracle of ``gbt_feature_contributions`` (r10 upgrade of the r8 axiom
    booleans; reference behavior certified:
    explainability/shap_explainer.py:78-126).

    Per tree t with stage weight w the walk emits, for every entity row:

      c_lat       round(contribution_{t,f} · 1e9)   per split feature f
      troot_lat   round(w · root_prediction · 1e9)  (entity-independent)
      tmargin_lat round(w · leaf_prediction  · 1e9) (the reached leaf)

    so the per-tree telescoping identity tmargin = troot + Σ_f c holds on
    the lattice to ±(d+2) half-ulps, and DuckDB can RECOMPUTE both it and
    the whole-model efficiency identity (Σ_t tmargin − Σ_t troot = Σ c)
    from the exported integers — a value check no Spark-side boolean
    mediates. Same node-mask vectorized kernel as
    ``gbt_path_contributions``; output is T× longer but still
    metadata-scale (entities × trees × features rows), no shuffle."""
    import numpy as np
    import pandas as pd

    trees = gbt_trees(model)
    names = list(feature_cols)
    schema = (
        f"{entity_col} long, tree int, feature string, "
        "c_lat long, troot_lat long, tmargin_lat long"
    )

    def lat(a):
        return np.floor(np.asarray(a, dtype=np.float64) * 1e9 + 0.5).astype(
            np.int64
        )

    def explain(batches):
        for pdf in batches:
            n = len(pdf)
            x = pdf[names].fillna(0).to_numpy(np.float64)
            out = []
            for t, (w, tree) in enumerate(trees):
                contrib = np.zeros((n, len(names)))
                margin = np.zeros(n)

                def walk(node, mask):
                    if "feat" not in node:
                        margin[mask] += w * node["pred"]
                        return
                    left = mask & (x[:, node["feat"]] <= node["thr"])
                    right = mask & ~left
                    contrib[left, node["feat"]] += w * (
                        node["left"]["pred"] - node["pred"]
                    )
                    contrib[right, node["feat"]] += w * (
                        node["right"]["pred"] - node["pred"]
                    )
                    walk(node["left"], left)
                    walk(node["right"], right)

                walk(tree, np.ones(n, dtype=bool))
                troot = lat(np.full(n, w * tree["pred"]))
                tmargin = lat(margin)
                for j, name in enumerate(names):
                    out.append(
                        pd.DataFrame(
                            {
                                entity_col: pdf[entity_col],
                                "tree": np.int32(t),
                                "feature": name,
                                "c_lat": lat(contrib[:, j]),
                                "troot_lat": troot,
                                "tmargin_lat": tmargin,
                            }
                        )
                    )
            yield pd.concat(out, ignore_index=True)

    return feats.select(entity_col, *names).mapInPandas(explain, schema=schema)


def gbt_shap_export(
    feats: DataFrame,
    model,
    feature_cols: list[str],
    entity_col: str = "user_id",
    background_limit: int = 32,
    max_features: int = 12,
) -> DataFrame:
    """Coalition-value + Shapley-value export on the 1e-9 integer lattice —
    the surface behind the value-recomputing oracle of ``gbt_shap_values``
    (r10 upgrade of the r8 axiom booleans). Emits, per entity, two row
    kinds in one long frame (sentinel-discriminated, no NULLs):

      coalition rows: (mask ∈ [0, 2^d), feature='',  v_lat,  phi_lat=0)
          v_lat = round(v(S)·1e9) where v(S) is the interventional
          coalition value E_b[margin(x_S ∪ b_~S)] — the exact quantity the
          Shapley formula consumes, so DuckDB can recompute every
          phi_i = Σ_{S∌i} w_|S| (v(S∪i) − v(S)) from integers alone
          (d=4 ⇒ 12·w_|S| ∈ {3,1,1,3}, exact).
      phi rows:       (mask=-1, feature=name, v_lat=0, phi_lat)
          phi_lat = round(phi_i·1e9) from the same float enumeration
          ``gbt_shap_values`` ships.

    Same 2^d coalition kernel as ``gbt_shap_values`` (one evaluation pass
    yields both kinds), no shuffle, metadata-scale output."""
    import math

    import numpy as np
    import pandas as pd

    names = list(feature_cols)
    d = len(names)
    if d > max_features:
        raise ValueError(
            f"exact Shapley enumerates 2^{d} coalitions; cap is "
            f"{max_features} features"
        )
    trees = gbt_trees(model)
    bg = (
        feats.na.fill(0, names)
        .orderBy(entity_col)
        .limit(background_limit)
        .select(*names)
        .toPandas()
        .to_numpy(np.float64)
    )
    n_bg = len(bg)
    if n_bg == 0:
        raise ValueError("empty background sample")
    wsize = [
        math.factorial(s) * math.factorial(d - s - 1) / math.factorial(d)
        for s in range(d)
    ]
    schema = (
        f"{entity_col} long, mask int, feature string, "
        "v_lat long, phi_lat long"
    )

    def lat(a):
        return np.floor(np.asarray(a, dtype=np.float64) * 1e9 + 0.5).astype(
            np.int64
        )

    def margin_of(X: "np.ndarray") -> "np.ndarray":
        out = np.zeros(len(X))

        def walk(node, mask, w):
            if "feat" not in node:
                out[mask] += w * node["pred"]
                return
            left = mask & (X[:, node["feat"]] <= node["thr"])
            walk(node["left"], left, w)
            walk(node["right"], mask & ~left, w)

        for w, tree in trees:
            walk(tree, np.ones(len(X), dtype=bool), w)
        return out

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = pdf[names].fillna(0).to_numpy(np.float64)
            xr = np.repeat(x, n_bg, axis=0)
            bgt = np.tile(bg, (n, 1))
            v = np.empty((1 << d, n))
            for m in range(1 << d):
                sel = np.array(
                    [(m >> j) & 1 for j in range(d)], dtype=bool
                )
                comp = np.where(sel[None, :], xr, bgt)
                v[m] = margin_of(comp).reshape(n, n_bg).mean(axis=1)
            phi = np.zeros((n, d))
            for i in range(d):
                bit = 1 << i
                for m in range(1 << d):
                    if m & bit:
                        continue
                    phi[:, i] += wsize[bin(m).count("1")] * (
                        v[m | bit] - v[m]
                    )
            out = []
            for m in range(1 << d):
                out.append(
                    pd.DataFrame(
                        {
                            entity_col: pdf[entity_col],
                            "mask": np.int32(m),
                            "feature": "",
                            "v_lat": lat(v[m]),
                            "phi_lat": np.int64(0),
                        }
                    )
                )
            for j, name in enumerate(names):
                out.append(
                    pd.DataFrame(
                        {
                            entity_col: pdf[entity_col],
                            "mask": np.int32(-1),
                            "feature": name,
                            "v_lat": np.int64(0),
                            "phi_lat": lat(phi[:, j]),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return feats.select(entity_col, *names).mapInPandas(kernel, schema=schema)


def gbt_path_contributions(
    feats: DataFrame,
    model,
    feature_cols: list[str],
    entity_col: str = "user_id",
) -> DataFrame:
    """Per-feature path attribution (Saabas decomposition) for a fitted
    GBT model — the tree-model counterpart of the exact linear Shapley in
    operators/explain.py, re-expressing the reference's TreeExplainer
    serving surface (explainability/shap_explainer.py:78-126): walking a
    row's decision path, each split's change in node prediction is
    attributed to the split feature, so

        margin(x) = base_value + Σ_i contribution_i(x)

    holds EXACTLY per row (telescoping sum), where margin is the model's
    boosted score (probability = 1 / (1 + exp(-2·margin))).

    Execution shape: the fitted trees are metadata (≤ 2^(depth+1) nodes ×
    max_iter) shipped in the UDF closure; attribution is an Arrow-batched
    mapInPandas kernel vectorized per tree NODE (boolean row masks), not
    per row — so executor work is O(nodes · batch) numpy ops and the
    corpus never shuffles. Output: (entity, feature, contribution,
    base_value, margin) long-format rows."""
    import numpy as np
    import pandas as pd

    trees = gbt_trees(model)
    names = list(feature_cols)
    schema = (
        f"{entity_col} long, feature string, contribution double, "
        "base_value double, margin double"
    )

    def explain(batches):
        for pdf in batches:
            n = len(pdf)
            x = pdf[names].fillna(0).to_numpy(np.float64)
            contrib = np.zeros((n, len(names)))
            margin = np.zeros(n)
            base = 0.0

            def walk(node, mask, w):
                if "feat" not in node:
                    margin[mask] += w * node["pred"]
                    return
                left = mask & (x[:, node["feat"]] <= node["thr"])
                right = mask & ~left
                contrib[left, node["feat"]] += w * (
                    node["left"]["pred"] - node["pred"]
                )
                contrib[right, node["feat"]] += w * (
                    node["right"]["pred"] - node["pred"]
                )
                walk(node["left"], left, w)
                walk(node["right"], right, w)

            for w, tree in trees:
                base += w * tree["pred"]
                walk(tree, np.ones(n, dtype=bool), w)
            out = []
            for j, name in enumerate(names):
                out.append(
                    pd.DataFrame(
                        {
                            entity_col: pdf[entity_col],
                            "feature": name,
                            "contribution": contrib[:, j],
                            "base_value": base,
                            # summed at the leaves during the walk; equals
                            # base + Σ contributions by telescoping (tested)
                            "margin": margin,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return feats.select(entity_col, *names).mapInPandas(explain, schema=schema)


def gbt_shap_values(
    feats: DataFrame,
    model,
    feature_cols: list[str],
    entity_col: str = "user_id",
    background_limit: int = 32,
    max_features: int = 12,
) -> DataFrame:
    """EXACT interventional Shapley values for a fitted GBT model —
    library-free re-expression of the reference's TreeExplainer surface
    (explainability/shap_explainer.py:78-126), complementing the Saabas
    path attribution with the axiomatic game-theoretic attribution:

        phi_i(x) = Σ_{S ⊆ F\\{i}} |S|!(d−|S|−1)!/d! · [v(S∪{i}) − v(S)]
        v(S)     = E_b~background[ margin(x_S ∪ b_{F\\S}) ]

    computed by full subset enumeration (2^d coalitions) against a
    deterministic background sample, so the efficiency axiom holds to
    float precision:  Σ_i phi_i = margin(x) − v(∅)  (pytest-pinned).

    Execution shape: trees + background are closure metadata; each Arrow
    batch evaluates all 2^d coalitions with the node-mask vectorized tree
    walk over an (n·|background|, d) composite matrix — O(2^d · |bg| ·
    nodes · batch) numpy ops, no shuffle, corpus streams through
    mapInPandas. Exponential in d by construction: guarded at
    ``max_features`` (the reference's served explanation uses a
    hand-picked feature vector of this scale too).

    Output long-format rows: (entity, feature, phi, base_value, margin).
    """
    import math

    import numpy as np
    import pandas as pd

    names = list(feature_cols)
    d = len(names)
    if d > max_features:
        raise ValueError(
            f"exact Shapley enumerates 2^{d} coalitions; cap is "
            f"{max_features} features — use gbt_path_contributions "
            "(Saabas) for wider models"
        )
    trees = gbt_trees(model)
    bg = (
        feats.na.fill(0, names)
        .orderBy(entity_col)
        .limit(background_limit)
        .select(*names)
        .toPandas()
        .to_numpy(np.float64)
    )
    n_bg = len(bg)
    if n_bg == 0:
        raise ValueError("empty background sample")
    full = (1 << d) - 1
    # Shapley kernel weights by coalition size
    wsize = [
        math.factorial(s) * math.factorial(d - s - 1) / math.factorial(d)
        for s in range(d)
    ]
    schema = (
        f"{entity_col} long, feature string, phi double, "
        "base_value double, margin double"
    )

    def margin_of(X: "np.ndarray") -> "np.ndarray":
        out = np.zeros(len(X))

        def walk(node, mask, w):
            if "feat" not in node:
                out[mask] += w * node["pred"]
                return
            left = mask & (X[:, node["feat"]] <= node["thr"])
            walk(node["left"], left, w)
            walk(node["right"], mask & ~left, w)

        for w, tree in trees:
            walk(tree, np.ones(len(X), dtype=bool), w)
        return out

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = pdf[names].fillna(0).to_numpy(np.float64)
            xr = np.repeat(x, n_bg, axis=0)
            bgt = np.tile(bg, (n, 1))
            v = np.empty((1 << d, n))
            for m in range(1 << d):
                sel = np.array(
                    [(m >> j) & 1 for j in range(d)], dtype=bool
                )
                comp = np.where(sel[None, :], xr, bgt)
                v[m] = margin_of(comp).reshape(n, n_bg).mean(axis=1)
            phi = np.zeros((n, d))
            for i in range(d):
                bit = 1 << i
                for m in range(1 << d):
                    if m & bit:
                        continue
                    phi[:, i] += wsize[bin(m).count("1")] * (
                        v[m | bit] - v[m]
                    )
            out = []
            for j, name in enumerate(names):
                out.append(
                    pd.DataFrame(
                        {
                            entity_col: pdf[entity_col],
                            "feature": name,
                            "phi": phi[:, j],
                            "base_value": v[0],
                            "margin": v[full],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return feats.select(entity_col, *names).mapInPandas(kernel, schema=schema)


def _tree_margin_fn(trees):
    """Vectorized margin evaluator for an extracted GBT tree list: one
    boolean-mask walk per tree node over the whole perturbation batch."""
    import numpy as np

    def margin_of(X: "object") -> "object":
        out = np.zeros(len(X))

        def walk(node, mask, w):
            if "feat" not in node:
                out[mask] += w * node["pred"]
                return
            left = mask & (X[:, node["feat"]] <= node["thr"])
            walk(node["left"], left, w)
            walk(node["right"], mask & ~left, w)

        for w, tree in trees:
            walk(tree, np.ones(len(X), dtype=bool), w)
        return out

    return margin_of


def _lime_sigma(feats: DataFrame, names: list[str]):
    """Default per-feature perturbation scale: population stddev (NULL→0),
    non-positive/NULL falling back to 1.0. One bounded driver row (a 1-row
    aggregate). Callers needing an exactly-reproducible scale pass
    ``sigma_override`` instead (the registered query uses the house
    DECIMAL-moment recipe so DuckDB can recompute sigma bit-exactly)."""
    import numpy as np

    sig_row = (
        feats.na.fill(0, names)
        .agg(*[F.stddev_pop(c).alias(c) for c in names])
        .first()
    )
    return np.array(
        [s if s and s > 0 else 1.0 for s in (sig_row[c] for c in names)],
        dtype=np.float64,
    )


def _lime_local_fits(x, uids, margin_of, sigma, n_samples, kw, ridge, seed):
    """Shared LIME core (weights query + evidence export): seeded
    per-entity Gaussian perturbations, exponential kernel weights, one
    vectorized tree walk for all n·S perturbed points, and the n batched
    (d+1)×(d+1) weighted ridge solves. Returns (z, y, beta, marg, r2) —
    standardized offsets, perturbed margins, surrogate coefficients
    (intercept first), true margins, weighted R². Per-entity results are
    independent of batch composition (each entity's arrays are
    contiguous and its RNG is seeded by (seed, entity))."""
    import numpy as np

    n, d = x.shape
    eye = np.eye(d + 1)
    eye[0, 0] = 0.0  # no ridge on the intercept
    z = np.empty((n, n_samples, d))
    for i, uid in enumerate(uids):
        z[i] = np.random.default_rng([seed, int(uid)]).standard_normal(
            (n_samples, d)
        )
    xp = x[:, None, :] + z * sigma[None, None, :]
    y = margin_of(xp.reshape(n * n_samples, d)).reshape(n, n_samples)
    w = np.exp(-(z**2).sum(axis=2) / (kw * kw))
    a = np.concatenate([np.ones((n, n_samples, 1)), z], axis=2)
    aw = a * w[:, :, None]
    g = np.einsum("nsi,nsj->nij", aw, a) + ridge * eye[None, :, :]
    b = np.einsum("nsi,ns->ni", aw, y)
    beta = np.linalg.solve(g, b)
    yhat = np.einsum("nsi,ni->ns", a, beta)
    wsum = w.sum(axis=1)
    ybar = (w * y).sum(axis=1) / wsum
    ss_res = (w * (y - yhat) ** 2).sum(axis=1)
    ss_tot = (w * (y - ybar[:, None]) ** 2).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = np.where(ss_tot > 0, 1.0 - ss_res / ss_tot, 1.0)
    marg = margin_of(x)
    return z, y, beta, marg, r2


def gbt_lime_weights(
    feats: DataFrame,
    model,
    feature_cols: list[str],
    entity_col: str = "user_id",
    n_samples: int = 256,
    kernel_width: float | None = None,
    ridge: float = 1e-6,
    seed: int = 7,
    sigma_override=None,
) -> DataFrame:
    """LIME local surrogate for a fitted GBT — library-free re-expression
    of the reference's LimeTabularExplainer serving surface
    (explainability/shap_explainer.py:256-296): per row, Gaussian
    perturbations around x (scale = population stddev per feature) are
    scored by the extracted-tree margin, weighted by the LIME exponential
    kernel over standardized distance (width 0.75·√d, the lime-tabular
    default), and fit with a ridge-regularized weighted linear surrogate.

    Output long-format rows per (entity, feature):
      weight           local linear effect per ORIGINAL feature unit
      weight_per_sigma effect per population stddev (cross-feature
                       comparable — the ranking surface)
      intercept        surrogate value AT the instance (the local_pred
                       analog: perturbation offsets are centered on x)
      margin           the model's true margin at x
      r2               weighted surrogate fit quality

    Deterministic: the perturbation stream is seeded per (seed, entity
    id), so results are independent of partitioning and batching.
    ``sigma_override`` replaces the default stddev_pop perturbation scale
    (which costs one bounded 1-row driver aggregate at plan-build time)
    with caller-supplied per-feature scales — the registered query passes
    the house DECIMAL-moment stddev so an independent engine can
    recompute sigma bit-exactly.

    Execution shape: trees + per-feature sigmas are closure metadata;
    each Arrow batch scores all n·S perturbations in ONE vectorized tree
    walk, then solves the n (d+1)×(d+1) weighted normal systems in a
    single batched ``np.linalg.solve``. No shuffle; the corpus streams
    through mapInPandas. Query surface: oracle-checked since r11 via the
    evidence-export contract (gbt_lime_export / _lime_identity_sql);
    determinism, SHAP top-feature agreement, and fit quality stay
    pytest-pinned.
    """
    import numpy as np
    import pandas as pd

    names = list(feature_cols)
    d = len(names)
    trees = gbt_trees(model)
    kw = kernel_width if kernel_width is not None else 0.75 * float(np.sqrt(d))
    sigma = (
        np.asarray(sigma_override, dtype=np.float64)
        if sigma_override is not None
        else _lime_sigma(feats, names)
    )
    margin_of = _tree_margin_fn(trees)
    schema = (
        f"{entity_col} long, feature string, weight double, "
        "weight_per_sigma double, intercept double, margin double, r2 double"
    )

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = pdf[names].fillna(0).to_numpy(np.float64)
            uids = pdf[entity_col].to_numpy(np.int64)
            _z, _y, beta, marg, r2 = _lime_local_fits(
                x, uids, margin_of, sigma, n_samples, kw, ridge, seed
            )
            out = []
            for j, name in enumerate(names):
                out.append(
                    pd.DataFrame(
                        {
                            entity_col: uids,
                            "feature": name,
                            "weight": beta[:, 1 + j] / sigma[j],
                            "weight_per_sigma": beta[:, 1 + j],
                            "intercept": beta[:, 0],
                            "margin": marg,
                            "r2": r2,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return feats.select(entity_col, *names).mapInPandas(kernel, schema=schema)


def gbt_lime_export(
    feats: DataFrame,
    model,
    feature_cols: list[str],
    entity_col: str = "user_id",
    n_samples: int = 256,
    kernel_width: float | None = None,
    ridge: float = 1e-6,
    seed: int = 7,
    sigma_override=None,
) -> DataFrame:
    """LIME evidence export backing the value-recomputing oracle contract
    (queries/training.py:_lime_identity_sql): per entity, the seeded
    standardized perturbation offsets z and the model margin y at each
    perturbed point (sample rows, s = 0..S−1) plus ONE fit row (s = −1)
    carrying the solved surrogate beta (intercept first), the true
    margin, the weighted R², and the per-feature perturbation scale g_j
    actually used. From the sample rows alone an independent engine
    rebuilds the kernel weights w = exp(−‖z‖²/kw²), the weighted normal
    equations G = A'WA + ridge·diag(0,1,…,1) and b = A'Wy, and pins the
    residual G·beta − b ≈ 0 against the exported beta — a wrong kernel,
    dropped sample, or broken solve is observable without reproducing
    numpy's RNG (np.linalg.solve is backward stable, so the honest
    residual sits at ~1e-12 while any defect is O(1); the contract
    rounds at 1e-6). Same deterministic per-(seed, entity) perturbation
    stream and identical solves as gbt_lime_weights (shared
    _lime_local_fits)."""
    import numpy as np
    import pandas as pd

    names = list(feature_cols)
    d = len(names)
    trees = gbt_trees(model)
    kw = kernel_width if kernel_width is not None else 0.75 * float(np.sqrt(d))
    sigma = (
        np.asarray(sigma_override, dtype=np.float64)
        if sigma_override is not None
        else _lime_sigma(feats, names)
    )
    margin_of = _tree_margin_fn(trees)
    zcols = [f"z{j}" for j in range(1, d + 1)]
    bcols = [f"b{j}" for j in range(d + 1)]
    gcols = [f"g{j}" for j in range(1, d + 1)]
    allcols = [entity_col, "s", *zcols, "y", *bcols, "margin", "r2", *gcols]
    schema = ", ".join(
        [f"{entity_col} long", "s long"] + [f"{c} double" for c in allcols[2:]]
    )

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = pdf[names].fillna(0).to_numpy(np.float64)
            uids = pdf[entity_col].to_numpy(np.int64)
            z, y, beta, marg, r2 = _lime_local_fits(
                x, uids, margin_of, sigma, n_samples, kw, ridge, seed
            )
            samp = pd.DataFrame(
                {
                    entity_col: np.repeat(uids, n_samples),
                    "s": np.tile(np.arange(n_samples, dtype=np.int64), n),
                }
            )
            for j, c in enumerate(zcols):
                samp[c] = z[:, :, j].reshape(-1)
            samp["y"] = y.reshape(-1)
            fit = pd.DataFrame({entity_col: uids, "s": np.int64(-1)})
            for j, c in enumerate(bcols):
                fit[c] = beta[:, j]
            fit["margin"] = marg
            fit["r2"] = r2
            for j, c in enumerate(gcols):
                fit[c] = sigma[j]
            yield pd.concat([samp, fit], ignore_index=True).reindex(
                columns=allcols
            )

    return feats.select(entity_col, *names).mapInPandas(kernel, schema=schema)


def train_mlp(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    hidden_layers: list[int] | None = None,
    max_iter: int = 100,
    seed: int = 7,
):
    """Feed-forward neural classifier — the Spark-native fill for the
    reference's deep-learning slot (models/advanced_models.py:74-105
    builds a Dense feed-forward net; the stacking ensemble's MLP arm is
    advanced_models.py:256): MLlib's MultilayerPerceptronClassifier
    trains the same shrinking-width architecture with distributed L-BFGS
    instead of an in-driver Keras fit. Deterministic seed; returns
    (model, summary_df) with one row per layer plus train AUC/accuracy.
    Rows-only surface — NN convergence is not bit-portable; separable-
    model recovery is pytest-pinned."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    hidden = hidden_layers or [16, 8]
    layers = [len(feature_cols), *hidden, 2]
    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features"
    ).transform(
        df.withColumn("label", F.col(label_col).cast("double")).na.fill(
            0, feature_cols
        )
    )
    model = MultilayerPerceptronClassifier(
        layers=layers, maxIter=max_iter, seed=seed, blockSize=64
    ).fit(assembled)
    scored = model.transform(assembled)
    auc = float(
        BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(scored)
    )
    acc = float(
        scored.agg(
            F.avg((F.col("prediction") == F.col("label")).cast("double"))
        ).first()[0]
    )
    rows = [
        (i, int(sz), len(layers), int(model.weights.size), auc, acc)
        for i, sz in enumerate(layers)
    ]
    summary = df.sparkSession.createDataFrame(
        rows,
        "layer_index int, layer_size int, n_layers int, n_weights int, "
        "train_auc double, train_accuracy double",
    )
    return model, summary


# The CV grid is import-time metadata (the ASHA config-space sharing
# rule): both the Spark query and the DuckDB oracle embed the same
# combos, so grid MEMBERSHIP is oracle-certified.
CV_GRID: list[dict] = [
    {"combo_id": i, "reg_param": r, "elastic_net_param": e}
    for i, (r, e) in enumerate(
        (r, e) for r in (0.0, 0.01, 0.1) for e in (0.0, 0.5)
    )
]


def cv_grid_auc(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    id_col: str,
    n_folds: int = 3,
    seed: int = 7,
) -> list[tuple]:
    """Per-(combo, fold) held-out AUC of a deterministic-hash k-fold CV
    over the logistic CV_GRID — the CrossValidator twin with EXPORTABLE
    internals (r11, VERDICT #4's pattern applied to the AutoML grid):
    MLlib CrossValidator only surfaces avgMetrics, so the per-fold
    evidence an oracle needs is invisible there. Folds are
    pmod(xxhash64(id), k) — the same row lands in the same fold on any
    cluster size; every fit is a distributed MLlib job. Returns
    (combo_id, fold, reg_param, elastic_net_param, val_auc) tuples with
    AUC rounded to 8 dp (the ASHA promotion idiom)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features"
    ).transform(
        df.withColumn("label", F.col(label_col).cast("double")).na.fill(
            0, feature_cols
        )
    ).withColumn(
        "fold", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_folds))
    ).persist()
    evaluator = BinaryClassificationEvaluator(metricName="areaUnderROC")
    rows = []
    try:
        for f in range(n_folds):
            train = assembled.where(F.col("fold") != f)
            held = assembled.where(F.col("fold") == f)
            for cfg in CV_GRID:
                model = LogisticRegression(
                    maxIter=50,
                    regParam=cfg["reg_param"],
                    elasticNetParam=cfg["elastic_net_param"],
                ).fit(train)
                auc = round(float(evaluator.evaluate(model.transform(held))), 8)
                rows.append(
                    (
                        cfg["combo_id"],
                        f,
                        cfg["reg_param"],
                        cfg["elastic_net_param"],
                        auc,
                    )
                )
    finally:
        assembled.unpersist()
    return rows


def cv_tuning_summary(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_folds: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Hyperparameter search summary — the AutoML slot
    (models/advanced_models.py:309-362 runs Optuna cross-validated
    trials over an XGBoost space) re-expressed Spark-native: MLlib
    CrossValidator evaluates a deterministic param grid with k-fold ROC
    AUC, fitting folds in parallel on the cluster instead of in-driver.
    One row per grid combo: (regParam, elasticNetParam, avg_auc,
    is_best), avg_auc = mean held-out AUC across folds. Rows-only —
    fold assignment and LBFGS paths are engine-specific; grid shape,
    metric bounds, and best-combo selection are pytest-pinned."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features"
    ).transform(
        df.withColumn("label", F.col(label_col).cast("double")).na.fill(
            0, feature_cols
        )
    )
    lr = LogisticRegression(maxIter=50)
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.01, 0.1])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(metricName="areaUnderROC"),
        numFolds=n_folds,
        parallelism=4,
        seed=seed,
    ).fit(assembled)
    best = int(max(range(len(cv.avgMetrics)), key=cv.avgMetrics.__getitem__))
    rows = [
        (
            float(pm[lr.regParam]),
            float(pm[lr.elasticNetParam]),
            float(m),
            i == best,
        )
        for i, (pm, m) in enumerate(zip(cv.getEstimatorParamMaps(), cv.avgMetrics))
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "reg_param double, elastic_net_param double, avg_auc double, "
        "is_best boolean",
    )


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


def asha_config_space(n_configs: int = 6, seed: int = 7) -> list[dict]:
    """The seeded PCG64 configuration sample behind ``asha_tuning_summary``
    — exposed so the registered query's DuckDB oracle can embed the exact
    config space as a VALUES literal (it is import-time metadata, a pure
    function of (n_configs, seed); the oracle independently recomputes the
    LADDER — membership, budgets, promotions — from this space plus the
    exported per-(rung, config) AUCs)."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(seed))
    return [
        {
            "config_id": i,
            "max_depth": int(rng.integers(2, 7)),
            "step_size": round(float(rng.uniform(0.05, 0.3)), 4),
            "subsample": round(float(rng.uniform(0.6, 1.0)), 4),
            "min_instances": int(rng.integers(1, 9)),
        }
        for i in range(n_configs)
    ]


def asha_tuning_summary(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    id_col: str,
    n_configs: int = 6,
    eta: int = 3,
    min_iter: int = 4,
    n_rungs: int = 3,
    seed: int = 7,
    estimator: str = "gbt",
) -> DataFrame:
    """AutoML beyond grid search — successive halving over a seeded
    random space (the honest distributed analog of the reference's
    Optuna trials, models/advanced_models.py:309-362; algorithm:
    Jamieson & Talwalkar's successive halving, the core of ASHA).

    ``n_configs`` configurations are sampled from a seeded PCG64 stream
    (maxDepth, stepSize, subsamplingRate, minInstancesPerNode for GBT;
    regParam, elasticNetParam for the "logreg" estimator, whose budget
    is L-BFGS iterations — one optimizer run per fit, so the ladder
    itself dominates cost, not per-tree job scheduling). Rung 0
    trains every config with ``min_iter`` budget units; each next
    rung keeps the top 1/eta by held-out AUC with an eta× budget. The
    budget therefore concentrates on survivors — total boosting work is
    O(n_configs·min_iter·n_rungs) instead of the grid's O(n·max_budget).

    Hold-out split is a deterministic hash (pmod(xxhash64(id), 5) == 0
    → validation), so rows land in the same split on any cluster size.
    Promotion ties break on (−auc, config_id) with AUC rounded to 8 dp —
    the ladder is reproducible. Each fit is an MLlib distributed job;
    nothing trains in-driver. One row per (rung, config) evaluation.

    Rows-only surface (GBT split selection is engine-specific); ladder
    structure, budget growth, promotion ordering, and determinism are
    pytest-pinned (test_automl.py)."""
    from pyspark.ml.classification import GBTClassifier, LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    configs = asha_config_space(n_configs, seed)

    def fit(cfg: dict, budget: int, train):
        if estimator == "logreg":
            # map the sampled space onto the regularization knobs: the
            # 0.05-0.3 step_size slot becomes regParam, subsample-1 the
            # elastic-net mix — same seeded stream, same ladder.
            return LogisticRegression(
                maxIter=budget,
                regParam=cfg["step_size"] / 10.0,
                elasticNetParam=round(1.0 - cfg["subsample"], 4),
            ).fit(train)
        return GBTClassifier(
            maxIter=budget,
            maxDepth=cfg["max_depth"],
            stepSize=cfg["step_size"],
            subsamplingRate=cfg["subsample"],
            minInstancesPerNode=cfg["min_instances"],
            seed=seed,
        ).fit(train)

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features"
    ).transform(
        df.withColumn("label", F.col(label_col).cast("double")).na.fill(
            0, feature_cols
        )
    )
    is_val = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(5)) == 0
    train = assembled.where(~is_val).persist()
    val = assembled.where(is_val).persist()
    evaluator = BinaryClassificationEvaluator(metricName="areaUnderROC")

    rows = []
    try:
        alive = configs
        for rung in range(n_rungs):
            budget = min_iter * eta**rung
            scored = []
            for cfg in alive:
                model = fit(cfg, budget, train)
                auc = round(float(evaluator.evaluate(model.transform(val))), 8)
                scored.append((cfg, auc))
            scored.sort(key=lambda t: (-t[1], t[0]["config_id"]))
            n_keep = max(len(scored) // eta, 1)
            promoted = {c["config_id"] for c, _ in scored[:n_keep]}
            last_rung = rung == n_rungs - 1
            for cfg, auc in scored:
                rows.append(
                    (
                        rung,
                        cfg["config_id"],
                        budget,
                        cfg["max_depth"],
                        cfg["step_size"],
                        cfg["subsample"],
                        cfg["min_instances"],
                        auc,
                        (not last_rung) and cfg["config_id"] in promoted,
                    )
                )
            alive = [c for c, _ in scored[:n_keep]]
            if len(alive) == 1 and not last_rung:
                # finish the survivor at the top budget, then stop
                continue
    finally:
        train.unpersist()
        val.unpersist()
    return df.sparkSession.createDataFrame(
        rows,
        "rung int, config_id int, budget_iters int, max_depth int, "
        "step_size double, subsample double, min_instances int, "
        "val_auc double, promoted boolean",
    )
