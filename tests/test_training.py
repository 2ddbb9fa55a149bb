"""Unit tests: MLlib training surface + retrain decision (reference
feedback_system.py:241-273, advanced_models.py:462-508)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from aml_feature_store_spark.operators.training import (
    retrain_decision,
    train_logistic,
)

BASE = dt.datetime(2024, 1, 1)


def _feedback_rows(
    n_older: int,
    n_recent: int,
    older_sep: float,
    recent_sep: float,
    accuracy: float = 1.0,
):
    """Synthetic feedback: `sep` controls how well predicted_score ranks
    actual_label per window (1.0 = perfect AUC, 0.0 = random)."""
    rows = []
    for period, n, sep, day0 in (
        ("older", n_older, older_sep, 1),
        ("recent", n_recent, recent_sep, 20),
    ):
        for i in range(n):
            label = i % 2 == 0
            if (i // 2) % 100 < int(sep * 100):
                score = 0.9 if label else 0.1  # correctly ranked
            else:
                score = 0.1 if label else 0.9  # inverted
            pred_label = label if (i % 100) < int(accuracy * 100) else not label
            rows.append(
                (
                    BASE + dt.timedelta(days=day0, minutes=i),
                    float(score),
                    bool(pred_label),
                    bool(label),
                    period,
                )
            )
    return rows


SCHEMA = (
    "ts timestamp, predicted_score double, predicted_label boolean, "
    "actual_label boolean, period string"
)


def _verdict(spark, rows):
    return retrain_decision(spark.createDataFrame(rows, SCHEMA)).collect()[0]


def test_retrain_insufficient_feedback(spark):
    v = _verdict(spark, _feedback_rows(200, 50, 1.0, 1.0))
    assert not v["should_retrain"]
    assert v["reason"] == "insufficient_feedback"


def test_retrain_on_auc_degradation(spark):
    # older window ranks perfectly, recent window is barely better than
    # random -> degradation > 0.05 -> drift arm fires
    v = _verdict(spark, _feedback_rows(200, 200, 1.0, 0.6))
    assert v["should_retrain"]
    assert v["reason"] == "performance_drift"
    assert v["auc_degradation"] > 0.05
    assert v["older_auc"] == 1.0


def test_retrain_on_low_accuracy(spark):
    # both windows healthy AUC, but predicted labels only 70% right
    v = _verdict(spark, _feedback_rows(200, 200, 1.0, 1.0, accuracy=0.7))
    assert v["should_retrain"]
    assert v["reason"] == "low_accuracy"
    assert v["feedback_accuracy"] < 0.85


def test_retrain_scheduled_when_stale(spark):
    # healthy metrics; data spans > 30 days -> scheduled retraining
    rows = _feedback_rows(200, 200, 1.0, 1.0)
    rows.append(
        (BASE + dt.timedelta(days=40), 0.9, True, True, "recent")
    )
    v = _verdict(spark, rows)
    assert v["should_retrain"]
    assert v["reason"] == "scheduled_retraining"
    assert v["days_since_training"] > 30


def test_retrain_not_needed_when_healthy(spark):
    v = _verdict(spark, _feedback_rows(200, 200, 1.0, 1.0))
    assert not v["should_retrain"]
    assert v["reason"] == "no_retraining_needed"


def test_train_logistic_recovers_separable_model(spark, tmp_path):
    # y = 1 iff x1 > 5: a separable rule; MLlib logistic should fit it
    # nearly perfectly and carry a positive x1 coefficient
    rows = [(float(i), float((i * 7) % 11), i > 5) for i in range(200)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, label boolean")
    model, summary = train_logistic(df, ["x1", "x2"], "label")
    s = {r["feature"]: r for r in summary.collect()}
    assert s["x1"]["coefficient"] > 0.0
    assert abs(s["x2"]["coefficient"]) < abs(s["x1"]["coefficient"])
    assert s["x1"]["train_auc"] > 0.99
    # MLlib persistence is the model-artifact store (reference
    # feedback_system.py:360-367 joblib store re-expressed)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    from pyspark.ml.classification import LogisticRegressionModel

    loaded = LogisticRegressionModel.load(path)
    assert loaded.coefficients[0] == model.coefficients[0]


def _separable_frame(spark):
    # y = 1 iff x1 > 5; x2 is a decoy
    rows = [
        (i, float(i % 12), float((i * 7) % 11), (i % 12) > 5)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "user_id long, x1 double, x2 double, label boolean"
    )


def test_train_gbt_recovers_separable_model(spark, tmp_path):
    from aml_feature_store_spark.operators.training import train_gbt

    df = _separable_frame(spark)
    model, summary = train_gbt(df, ["x1", "x2"], "label")
    s = {r["feature"]: r for r in summary.collect()}
    assert s["x1"]["train_auc"] > 0.99
    assert s["x1"]["importance"] > s["x2"]["importance"]
    # model-artifact store round-trip, as for logistic
    path = str(tmp_path / "gbt")
    model.write().overwrite().save(path)
    from pyspark.ml.classification import GBTClassificationModel

    loaded = GBTClassificationModel.load(path)
    assert list(loaded.treeWeights) == list(model.treeWeights)


def test_gbt_contributions_telescope_to_margin(spark):
    import math

    from aml_feature_store_spark.operators.training import (
        gbt_path_contributions,
        train_gbt,
    )

    df = _separable_frame(spark)
    model, _ = train_gbt(df, ["x1", "x2"], "label")
    rows = gbt_path_contributions(df, model, ["x1", "x2"]).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user) == 200 and all(len(v) == 2 for v in by_user.values())
    # margin = base + sum(contributions) exactly (telescoping walk), and
    # sigmoid(2*margin) reproduces the model's served probability
    probs = {
        r["user_id"]: float(r["probability"][1])
        for r in model.transform(
            __import__("pyspark.ml.feature", fromlist=["VectorAssembler"])
            .VectorAssembler(inputCols=["x1", "x2"], outputCol="features")
            .transform(df)
        ).collect()
    }
    for uid, rs in by_user.items():
        base, margin = rs[0]["base_value"], rs[0]["margin"]
        total = base + sum(r["contribution"] for r in rs)
        assert total == pytest.approx(margin, abs=1e-9)
        assert 1.0 / (1.0 + math.exp(-2.0 * margin)) == pytest.approx(
            probs[uid], abs=1e-9
        )
    # the decisive feature dominates the attribution mass
    mass = {
        f: sum(abs(r["contribution"]) for rs in by_user.values() for r in rs
               if r["feature"] == f)
        for f in ("x1", "x2")
    }
    assert mass["x1"] > mass["x2"]


def test_gbt_shap_efficiency_axiom(spark):
    from aml_feature_store_spark.operators.training import (
        gbt_shap_values,
        train_gbt,
    )

    df = _separable_frame(spark)
    model, _ = train_gbt(df, ["x1", "x2"], "label")
    rows = gbt_shap_values(df, model, ["x1", "x2"], background_limit=16).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user) == 200 and all(len(v) == 2 for v in by_user.values())
    for rs in by_user.values():
        base, margin = rs[0]["base_value"], rs[0]["margin"]
        # efficiency axiom: sum(phi) = margin(x) - E_bg[margin]
        assert base + sum(r["phi"] for r in rs) == pytest.approx(margin, abs=1e-9)
    # decisive feature dominates the Shapley mass too
    mass = {
        f: sum(abs(r["phi"]) for rs in by_user.values() for r in rs
               if r["feature"] == f)
        for f in ("x1", "x2")
    }
    assert mass["x1"] > mass["x2"]


def test_gbt_shap_single_feature_closed_form(spark):
    """With one feature, exact Shapley collapses to
    phi_0 = margin(x) - mean(margin(background)) for every row."""
    from aml_feature_store_spark.operators.training import (
        gbt_shap_values,
        gbt_trees,
        train_gbt,
    )
    import numpy as np

    df = _separable_frame(spark).select("user_id", "x1", "label")
    model, _ = train_gbt(df, ["x1"], "label")
    rows = gbt_shap_values(df, model, ["x1"], background_limit=8).collect()
    # recompute margins driver-side from the extracted trees
    trees = gbt_trees(model)

    def margin(v: float) -> float:
        tot = 0.0
        for w, t in trees:
            node = t
            while "feat" in node:
                node = node["left"] if v <= node["thr"] else node["right"]
            tot += w * node["pred"]
        return tot

    pdf = df.orderBy("user_id").limit(8).toPandas()
    bg_mean = float(np.mean([margin(v) for v in pdf["x1"]]))
    xs = {r["user_id"]: r["x1"] for r in df.collect()}
    for r in rows:
        assert r["base_value"] == pytest.approx(bg_mean, abs=1e-9)
        assert r["margin"] == pytest.approx(margin(xs[r["user_id"]]), abs=1e-9)
        assert r["phi"] == pytest.approx(r["margin"] - bg_mean, abs=1e-9)


def test_gbt_lime_deterministic_and_agrees_with_shap(spark):
    """LIME surrogate pins (VERDICT r4 #5): deterministic across runs and
    partitionings, decisive-feature agreement with exact Shapley, and a
    sane weighted fit quality on the separable model."""
    from aml_feature_store_spark.operators.training import (
        gbt_lime_weights,
        gbt_shap_values,
        train_gbt,
    )

    df = _separable_frame(spark)
    model, _ = train_gbt(df, ["x1", "x2"], "label")
    rows = gbt_lime_weights(df, model, ["x1", "x2"]).collect()
    by_user: dict[int, dict[str, object]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], {})[r["feature"]] = r
    assert len(by_user) == 200 and all(len(v) == 2 for v in by_user.values())

    # determinism: per-entity seeded perturbations -> identical rows even
    # under a different partitioning
    again = {
        (r["user_id"], r["feature"]): r
        for r in gbt_lime_weights(
            df.repartition(7), model, ["x1", "x2"]
        ).collect()
    }
    for r in rows:
        r2 = again[(r["user_id"], r["feature"])]
        assert r2["weight"] == r["weight"] and r2["r2"] == r["r2"]

    # the decisive feature dominates the standardized local weights
    mass = {
        f: sum(abs(v[f]["weight_per_sigma"]) for v in by_user.values())
        for f in ("x1", "x2")
    }
    assert mass["x1"] > 5 * mass["x2"]

    # per-entity top feature agrees with exact Shapley for a clear majority
    shap_rows = gbt_shap_values(df, model, ["x1", "x2"], background_limit=16).collect()
    shap_by_user: dict[int, dict[str, float]] = {}
    for r in shap_rows:
        shap_by_user.setdefault(r["user_id"], {})[r["feature"]] = abs(r["phi"])
    agree = 0
    for uid, v in by_user.items():
        lime_top = max(v, key=lambda f: abs(v[f]["weight_per_sigma"]))
        shap_top = max(shap_by_user[uid], key=shap_by_user[uid].get)
        agree += lime_top == shap_top
    assert agree / len(by_user) >= 0.7

    # surrogate quality: piecewise-constant model, local linear fit still
    # explains most weighted variance on average
    import statistics

    mean_r2 = statistics.mean(
        v["x1"]["r2"] for v in by_user.values()
    )
    assert mean_r2 > 0.3


def test_gbt_nl_explanations_structure(spark):
    """NL generator pins: one sentence per top-3 feature with the
    reference's direction/strength wording, risk level from the model
    probability, recommendation ladder thresholds."""
    from aml_feature_store_spark.queries.training import gbt_nl_explanations
    import math

    # route through the registered query on real testdata
    rows = gbt_nl_explanations(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no explanation rows"
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        p = rs[0]["risk_probability"]
        want_level = "LOW" if p <= 0.3 else ("MEDIUM" if p <= 0.6 else "HIGH")
        want_rec = (
            "block_and_investigate" if p > 0.8
            else "approve_with_monitoring" if p > 0.6
            else "approve_routine_monitoring" if p > 0.3
            else "approve"
        )
        for r in rs:
            assert r["risk_level"] == want_level
            assert r["recommendation"] == want_rec
            assert r["feature"] in r["explanation"]
            word = "raises" if r["contribution"] >= 0 else "lowers"
            assert word in r["explanation"]
            strength = "strongly" if abs(r["contribution"]) > 0.1 else "moderately"
            assert strength in r["explanation"]
            assert not (math.isnan(p) or p < 0 or p > 1)
        # factor-specific recommendation (reference shap_explainer.py:
        # 422-431): keyed on the top risk-RAISING feature, constant per
        # user, drawn from the reference's ladder (or null when no
        # feature raises risk / the top raiser has no mapped advice)
        recs = {r["factor_recommendation"] for r in rs}
        assert len(recs) == 1, recs
        rec = recs.pop()
        assert rec in {
            None,
            "verify_entity_diversity",
            "verify_velocity_justified",
            "investigate_night_activity",
        }
        # a user whose emitted rows are ALL risk-lowering can still have a
        # (non-emitted) top raiser, so None is only provably wrong when an
        # emitted positive feature carries a mapped name
        if rec is None:
            for r in rs:
                if r["contribution"] > 0:
                    assert not any(
                        k in r["feature"]
                        for k in ("unique", "velocity", "night")
                    ) or any(
                        o["contribution"] > r["contribution"] for o in rs
                    ), (uid, r["feature"])


def test_mlp_recovers_separable_model(spark):
    """DL parity slot (VERDICT r4 #6): the MLP fits the separable rule
    near-perfectly with a deterministic seed."""
    from aml_feature_store_spark.operators.training import train_mlp

    df = _separable_frame(spark)
    model, summary = train_mlp(df, ["x1", "x2"], "label")
    rows = summary.collect()
    # one row per layer: input(2) -> 16 -> 8 -> output(2)
    assert [r["layer_size"] for r in sorted(rows, key=lambda r: r["layer_index"])] == [2, 16, 8, 2]
    assert all(r["n_weights"] == int(model.weights.size) for r in rows)
    assert rows[0]["train_auc"] > 0.95
    assert rows[0]["train_accuracy"] > 0.9
    # deterministic seed -> identical refit
    model2, _ = train_mlp(df, ["x1", "x2"], "label")
    assert list(model2.weights) == list(model.weights)


def test_cv_tuning_summary_grid_and_best(spark):
    """AutoML parity slot: full 3x2 grid, sane AUC bounds, exactly one
    best combo, and the best combo attains the max metric."""
    from aml_feature_store_spark.operators.training import cv_tuning_summary

    df = _separable_frame(spark)
    rows = cv_tuning_summary(df, ["x1", "x2"], "label").collect()
    combos = {(r["reg_param"], r["elastic_net_param"]) for r in rows}
    assert combos == {
        (rp, en) for rp in (0.0, 0.01, 0.1) for en in (0.0, 0.5)
    }
    assert all(0.0 <= r["avg_auc"] <= 1.0 for r in rows)
    best = [r for r in rows if r["is_best"]]
    assert len(best) == 1
    assert best[0]["avg_auc"] == max(r["avg_auc"] for r in rows)
    # a separable problem cross-validates to a strong AUC somewhere
    assert best[0]["avg_auc"] > 0.9


def test_gbt_export_identities_and_mutation_detection(spark, tmp_path):
    """r10 value-recomputing contract: the per-tree Saabas export and the
    coalition-value Shapley export satisfy their lattice identities with
    residual EXACTLY 0 (no tolerance), DuckDB recomputes the same zero
    from the written parquet, and a single corrupted lattice cell turns
    the recomputed residuals nonzero — the detection property the
    registered oracles rely on."""
    import duckdb

    from aml_feature_store_spark.operators.training import (
        gbt_path_contributions_per_tree,
        gbt_shap_export,
        train_gbt,
    )
    from aml_feature_store_spark.queries.training import (
        _contrib_identity_sql,
        _shap_identity_sql,
    )

    df = _separable_frame(spark)
    model, _ = train_gbt(df, ["x1", "x2"], "label")

    cpath = str(tmp_path / "contrib")
    gbt_path_contributions_per_tree(df, model, ["x1", "x2"]).write.parquet(
        cpath
    )
    csrc = f"SELECT * FROM read_parquet('{cpath}/*.parquet')"
    cdf = duckdb.sql(_contrib_identity_sql(csrc, computed=False)).df()
    assert len(cdf) == 400  # 200 users x 2 features
    assert (cdf.eff_resid_micro == 0).all()
    assert (cdf.tree_resid_micro == 0).all()
    # per-tree aggregation matches the single-pass operator on the lattice
    spath = str(tmp_path / "shap")
    gbt_shap_export(df, model, ["x1", "x2"], background_limit=16).write.parquet(
        spath
    )
    ssrc = f"SELECT * FROM read_parquet('{spath}/*.parquet')"
    sdf = duckdb.sql(
        _shap_identity_sql(ssrc, computed=False, features=["x1", "x2"])
    ).df()
    assert len(sdf) == 400
    assert (sdf.phi_resid_micro == 0).all()
    assert (sdf.eff_resid_micro == 0).all()

    # mutation: +1e-3 on one exported cell must redden the recomputation
    cbad = duckdb.sql(
        _contrib_identity_sql(
            "SELECT user_id, tree, feature, c_lat + CASE WHEN user_id = 3 "
            "AND tree = 0 AND feature = 'x1' THEN 1000000 ELSE 0 END AS "
            f"c_lat, troot_lat, tmargin_lat FROM read_parquet('{cpath}/*.parquet')",
            computed=False,
        )
    ).df()
    hit = cbad[cbad.user_id == 3]
    assert (hit.tree_resid_micro != 0).all() and (hit.eff_resid_micro != 0).all()
    sbad = duckdb.sql(
        _shap_identity_sql(
            "SELECT user_id, mask, feature, v_lat + CASE WHEN user_id = 3 "
            "AND mask = 1 AND feature = '' THEN 1000000 ELSE 0 END AS "
            f"v_lat, phi_lat FROM read_parquet('{spath}/*.parquet')",
            computed=False,
            features=["x1", "x2"],
        )
    ).df()
    assert (sbad[sbad.user_id == 3].phi_resid_micro != 0).any()
    # and rows for untouched users stay zero
    assert (sbad[sbad.user_id != 3].phi_resid_micro == 0).all()


def test_lime_export_contract_and_mutation_detection(spark, tmp_path):
    """r11 value-recomputing LIME contract: DuckDB rebuilds the kernel
    weights and weighted normal equations from the exported perturbation
    evidence and pins G·beta − b ≈ 0, the weighted R², and the house
    DECIMAL-moment sigma — all residuals land on exact lattice zero for
    an honest export; corrupting one beta cell or one perturbation
    offset reddens the affected user's residuals and no one else's."""
    import duckdb

    from aml_feature_store_spark.operators.training import (
        gbt_lime_export,
        gbt_lime_weights,
        train_gbt,
    )
    from aml_feature_store_spark.queries.training import (
        _lime_house_sigma,
        _lime_identity_sql,
    )

    df = _separable_frame(spark)
    model, _ = train_gbt(df, ["x1", "x2"], "label")
    sigma = _lime_house_sigma(df, ["x1", "x2"])
    path = str(tmp_path / "lime")
    gbt_lime_export(
        df, model, ["x1", "x2"], sigma_override=sigma
    ).write.parquet(path)
    fpath = str(tmp_path / "feats")
    df.select("user_id", "x1", "x2").write.parquet(fpath)
    src = f"SELECT * FROM read_parquet('{path}/*.parquet')"
    fsrc = f"SELECT user_id, x1, x2 FROM read_parquet('{fpath}/*.parquet')"
    out = duckdb.sql(
        _lime_identity_sql(src, fsrc, computed=False, features=["x1", "x2"])
    ).df()
    assert len(out) == 400  # 200 users x 2 features
    assert (out.ne_resid_micro == 0).all()
    assert (out.r2_resid_micro == 0).all()
    assert (out.sigma_resid_micro == 0).all()

    # the read-back surface is the operator's own surface, bit-for-bit
    rows = {
        (r["user_id"], r["feature"]): r
        for r in gbt_lime_weights(
            df, model, ["x1", "x2"], sigma_override=sigma
        ).collect()
    }
    for r in out.itertuples():
        op = rows[(r.user_id, r.feature)]
        assert op["weight_per_sigma"] == r.weight_per_sigma
        assert op["weight"] == r.weight and op["r2"] == r.r2

    # mutation 1: +1e-3 on one solved coefficient -> that user's normal
    # equations no longer balance; untouched users stay zero
    cols = "user_id, s, z1, z2, y, b0, {b1}, b2, margin, r2, g1, g2"
    bad = duckdb.sql(
        _lime_identity_sql(
            "SELECT "
            + cols.format(
                b1="b1 + CASE WHEN user_id = 3 AND s = -1 THEN 0.001 "
                "ELSE 0 END AS b1"
            )
            + f" FROM read_parquet('{path}/*.parquet')",
            fsrc,
            computed=False,
            features=["x1", "x2"],
        )
    ).df()
    assert (bad[bad.user_id == 3].ne_resid_micro != 0).all()
    assert (bad[bad.user_id != 3].ne_resid_micro == 0).all()

    # mutation 2: nudging one perturbation offset changes the rebuilt
    # kernel weight + normal equations for that user
    bad2 = duckdb.sql(
        _lime_identity_sql(
            "SELECT user_id, s, z1 + CASE WHEN user_id = 3 AND s = 0 THEN "
            "0.5 ELSE 0 END AS z1, z2, y, b0, b1, b2, margin, r2, g1, g2"
            + f" FROM read_parquet('{path}/*.parquet')",
            fsrc,
            computed=False,
            features=["x1", "x2"],
        )
    ).df()
    assert (bad2[bad2.user_id == 3].ne_resid_micro != 0).all()
    assert (bad2[bad2.user_id != 3].ne_resid_micro == 0).all()
