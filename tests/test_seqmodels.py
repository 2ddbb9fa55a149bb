"""Numpy LSTM + autoencoder, data-parallel training (operators/seqmodels).

Correctness strategy for models with no SQL oracle:
  1. analytic gradients vs central finite differences (the strongest
     check a hand-written backward pass can get);
  2. optimization sanity — loss monotonically trending down, a separable
     toy set overfit to high accuracy;
  3. the distributed (applyInPandas partial-sum) gradient equals the
     pure-numpy full-batch gradient on the same rows;
  4. bit-determinism of the training history across runs.
"""

from __future__ import annotations

import numpy as np
import pytest

from aml_feature_store_spark.operators import seqmodels as sm

SF_SMOKE = "/root/testdata/sf0.001"


def _num_grad(loss_fn, params, eps=1e-6):
    flat, spec = sm.flatten(params)
    g = np.zeros_like(flat)
    for i in range(len(flat)):
        up, dn = flat.copy(), flat.copy()
        up[i] += eps
        dn[i] -= eps
        g[i] = (
            loss_fn(sm.unflatten(up, spec)) - loss_fn(sm.unflatten(dn, spec))
        ) / (2 * eps)
    return g


def test_lstm_gradcheck():
    rng = np.random.Generator(np.random.PCG64(3))
    X = rng.normal(size=(4, 5, 3))
    y = np.array([0.0, 1.0, 1.0, 0.0])
    params = sm.lstm_init(3, 4, seed=5)

    _, grads = sm.lstm_loss_and_grads(params, X, y)
    flat_g = np.concatenate(
        [grads[k].ravel() for k, _ in sm.flatten(params)[1]]
    )
    num = _num_grad(lambda p: sm.lstm_loss_and_grads(p, X, y)[0], params)
    denom = np.maximum(np.abs(flat_g) + np.abs(num), 1e-8)
    assert np.max(np.abs(flat_g - num) / denom) < 1e-5


def test_ae_gradcheck():
    rng = np.random.Generator(np.random.PCG64(4))
    X = rng.normal(size=(6, 5))
    params = sm.ae_init(5, 3, seed=6)

    _, grads = sm.ae_loss_and_grads(params, X)
    flat_g = np.concatenate(
        [grads[k].ravel() for k, _ in sm.flatten(params)[1]]
    )
    num = _num_grad(lambda p: sm.ae_loss_and_grads(p, X)[0], params)
    denom = np.maximum(np.abs(flat_g) + np.abs(num), 1e-8)
    assert np.max(np.abs(flat_g - num) / denom) < 1e-5


def test_lstm_overfits_separable_toy():
    # class 1: rising sequences; class 0: falling — trivially separable
    rng = np.random.Generator(np.random.PCG64(9))
    T, F_ = 6, 2
    X, y = [], []
    for i in range(24):
        base = np.linspace(0, 1, T) if i % 2 else np.linspace(1, 0, T)
        seq = np.stack([base + rng.normal(0, 0.02, T)] * F_, axis=1)
        X.append(seq)
        y.append(float(i % 2))
    X, y = np.asarray(X), np.asarray(y)
    params = sm.lstm_init(F_, 6, seed=1)
    flat, spec = sm.flatten(params)
    opt = sm.Adam(len(flat), lr=0.05)
    losses = []
    for _ in range(120):
        loss, grads = sm.lstm_loss_and_grads(
            sm.unflatten(flat, spec), X, y
        )
        g = np.concatenate([grads[k].ravel() for k, _ in spec])
        flat = opt.step(flat, g / len(X))
        losses.append(loss / len(X))
    prob, _ = sm.lstm_forward(sm.unflatten(flat, spec), X)
    assert np.mean((prob >= 0.5) == (y >= 0.5)) >= 0.95
    assert losses[-1] < losses[0] * 0.5


def test_distributed_grad_matches_local(spark):
    rows = []
    rng = np.random.Generator(np.random.PCG64(13))
    for i in range(20):
        x = rng.normal(size=(4, 3)).tolist()
        rows.append((i, int(i % 3), x, float(i % 2)))
    df = spark.createDataFrame(
        rows, "key long, pid long, x array<array<double>>, y double"
    ).persist()
    params0 = sm.lstm_init(3, 4, seed=2)
    trained, hist = sm.train_distributed(
        df, params0, sm.lstm_loss_and_grads, epochs=1, lr=0.01
    )
    # replicate the driver fold locally: bucket-sorted partial sums
    flat0, spec = sm.flatten(sm.lstm_init(3, 4, seed=2))
    grad = np.zeros_like(flat0)
    loss = 0.0
    for pid in sorted({r[1] for r in rows}):
        part = sorted((r for r in rows if r[1] == pid), key=lambda r: r[0])
        X = np.asarray([r[2] for r in part])
        y = np.asarray([r[3] for r in part])
        l, g = sm.lstm_loss_and_grads(sm.unflatten(flat0, spec), X, y)
        grad += np.concatenate([g[k].ravel() for k, _ in spec])
        loss += l
    opt = sm.Adam(len(flat0), lr=0.01)
    expect = opt.step(flat0, grad / len(rows))
    got, _ = sm.flatten(trained)
    assert np.allclose(got, expect, rtol=0, atol=1e-12)
    assert hist[0][1] == round(loss / len(rows), 10)
    df.unpersist()


def test_lstm_summary_deterministic(spark):
    from aml_feature_store_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    a = sm.lstm_sequence_summary(ev, epochs=3, sample_mod=4).collect()
    b = sm.lstm_sequence_summary(ev, epochs=3, sample_mod=4).collect()
    assert a == b
    stages = {r["stage"] for r in a}
    assert {"train_loss", "train_accuracy", "n_sequences"} <= stages
    losses = [r["value"] for r in a if r["stage"] == "train_loss"]
    assert losses[-1] <= losses[0]


def test_autoencoder_flags_planted_outlier(spark):
    rng = np.random.Generator(np.random.PCG64(21))
    rows = [
        (f"u{i:03d}", *(rng.normal(0, 1, 3)).tolist()) for i in range(200)
    ]
    rows.append(("zz_outlier", 40.0, -35.0, 50.0))
    df = spark.createDataFrame(rows, "user_id string, a double, b double, c double")
    out = sm.autoencoder_scores(
        df, ["a", "b", "c"], hidden=2, epochs=20, top_n=5
    ).collect()
    assert out[0]["user_id"] == "zz_outlier"
    # deterministic across runs
    again = sm.autoencoder_scores(
        df, ["a", "b", "c"], hidden=2, epochs=20, top_n=5
    ).collect()
    assert out == again


def test_lstm_forward_contract_matches_local_replay(spark):
    """The iter0 contract rows equal a from-scratch local replay: build
    each sampled event's (8,3) sequence in pure pandas/numpy straight
    from the raw events (independent of event_sequences), run
    lstm_forward locally, and compare every exported value bit-for-bit
    after the house 6-dp rounding."""
    from aml_feature_store_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    got = {
        r["event_id"]: r
        for r in sm.lstm_forward_contract(ev, seq_len=8, hidden=8).collect()
    }
    assert got, "contract returned no rows"

    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    params = sm.lstm_init(3, 8, seed=7)
    checked = 0
    for _, grp in pdf.groupby("user_id"):
        vals = grp["value"].to_numpy()
        ms = grp["ts"].astype("int64").to_numpy() // 1_000_000
        ids = grp["event_id"].to_numpy()
        types = grp["event_type"].to_numpy()
        for j in range(len(grp)):
            if int(ids[j]) % 7 != 3:
                continue
            steps = []
            for i in range(8, 0, -1):  # oldest first, lag i
                if j - i >= 0:
                    steps.append(
                        [
                            np.log1p(vals[j - i]),
                            np.log1p((ms[j] - ms[j - i]) / 1000.0),
                            1.0,
                        ]
                    )
                else:
                    steps.append([0.0, 0.0, 0.0])
            X = np.asarray([steps])
            prob, (_, hs, _, _, _) = sm.lstm_forward(params, X)
            y = 1.0 if types[j] == "purchase" else 0.0
            eps = 1e-12
            bce = -(
                y * np.log(prob[0] + eps)
                + (1.0 - y) * np.log(1.0 - prob[0] + eps)
            )
            row = got[int(ids[j])]
            assert row["label"] == y
            for m in range(8):
                assert row[f"h_{m}"] == np.round(hs[8][0, m], 6) + 0.0
            assert row["prob_iter0"] == np.round(prob[0], 6) + 0.0
            assert row["bce_iter0"] == np.round(bce, 6) + 0.0
            checked += 1
    assert checked == len(got)
