"""True sequence / reconstruction models in numpy, trained data-parallel
(SURVEY §2.10; reference: models/advanced_models.py:144-172 LSTM sequence
model, :107-143 autoencoder anomaly detector).

The container ships no DL runtime (no tensorflow/torch), so the recurrent
and reconstruction models the reference builds with Keras are implemented
here from first principles in numpy — faithful LSTM gate equations with
full backpropagation-through-time, and a nonlinear (ReLU-hidden) MLP
autoencoder — and trained with the standard data-parallel pattern Spark's
own MLlib optimizers use (treeAggregate-style partial gradients):

  1. sequences/rows are bucketed by a deterministic hash
     (``pmod(xxhash64(key), n_buckets)``) and cached once;
  2. each epoch broadcasts the flat parameter vector, computes per-bucket
     gradient SUMS with one vectorized numpy kernel per bucket
     (``groupBy(pid).applyInPandas`` — Arrow-batched, never row-at-a-time);
  3. the driver folds the n_buckets (bucket-id-sorted, so float summation
     order is fixed) partial sums and takes one Adam step.

Scale notes (100 TB): the collect is ``n_buckets`` rows of ``n_params``
doubles — bounded and independent of data size; gradient math is
O(rows·T·H²) spread across the cluster; parameters are a few KB so the
broadcast is free. This is exactly how distributed SGD over a 1000-executor
cluster works; nothing here is driver-bound except the O(n_params) fold.

Determinism: seeded PCG64 init, fixed epoch count, bucket-sorted driver
fold, within-bucket sort by key before the batch sum, and losses rounded
at emission. Two runs on the same data produce bit-identical histories
(pytest-pinned), and the analytic gradients are finite-difference checked.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# LSTM cell: init / forward / backward (sum-reduced loss + grads)
# ---------------------------------------------------------------------------


def lstm_init(n_features: int, hidden: int, seed: int = 7) -> dict:
    """Glorot-uniform gate weights, forget-gate bias +1 (the standard
    trainability trick), all from one seeded PCG64 stream."""
    rng = np.random.Generator(np.random.PCG64(seed))
    h, f = hidden, n_features

    def glorot(shape):
        lim = math.sqrt(6.0 / (shape[0] + shape[1]))
        return rng.uniform(-lim, lim, size=shape)

    params = {
        "Wx": glorot((f, 4 * h)),
        "Wh": glorot((h, 4 * h)),
        "b": np.zeros(4 * h),
        "Wy": glorot((h, 1)),
        "by": np.zeros(1),
    }
    params["b"][h : 2 * h] = 1.0  # forget gate open at init
    return params


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def lstm_forward(params: dict, X: np.ndarray):
    """X: (B, T, F) → (prob (B,), caches for BPTT)."""
    B, T, _ = X.shape
    h = params["Wh"].shape[0]
    hs = np.zeros((T + 1, B, h))
    cs = np.zeros((T + 1, B, h))
    gates = []
    for t in range(T):
        z = X[:, t, :] @ params["Wx"] + hs[t] @ params["Wh"] + params["b"]
        i = _sigmoid(z[:, :h])
        f = _sigmoid(z[:, h : 2 * h])
        g = np.tanh(z[:, 2 * h : 3 * h])
        o = _sigmoid(z[:, 3 * h :])
        cs[t + 1] = f * cs[t] + i * g
        hs[t + 1] = o * np.tanh(cs[t + 1])
        gates.append((i, f, g, o))
    logit = (hs[T] @ params["Wy"] + params["by"]).ravel()
    prob = _sigmoid(logit)
    return prob, (X, hs, cs, gates, prob)


def lstm_loss_and_grads(params: dict, X: np.ndarray, y: np.ndarray):
    """SUM-reduced binary cross-entropy loss and parameter gradients
    (caller divides by the global N — keeps distributed partial sums
    exact). Returns (loss_sum, grads dict matching params)."""
    B, T, _ = X.shape
    h = params["Wh"].shape[0]
    prob, (X, hs, cs, gates, _) = lstm_forward(params, X)
    eps = 1e-12
    loss = -np.sum(
        y * np.log(prob + eps) + (1.0 - y) * np.log(1.0 - prob + eps)
    )
    grads = {k: np.zeros_like(v) for k, v in params.items()}
    dlogit = (prob - y)[:, None]  # (B, 1); sum-reduced BCE+sigmoid
    grads["Wy"] = hs[T].T @ dlogit
    grads["by"] = dlogit.sum(axis=0)
    dh = dlogit @ params["Wy"].T
    dc = np.zeros((B, h))
    for t in range(T - 1, -1, -1):
        i, f, g, o = gates[t]
        tc = np.tanh(cs[t + 1])
        dc = dc + dh * o * (1.0 - tc * tc)
        di = dc * g * i * (1.0 - i)
        df = dc * cs[t] * f * (1.0 - f)
        dg = dc * i * (1.0 - g * g)
        do = dh * tc * o * (1.0 - o)
        dz = np.concatenate([di, df, dg, do], axis=1)  # (B, 4h)
        grads["Wx"] += X[:, t, :].T @ dz
        grads["Wh"] += hs[t].T @ dz
        grads["b"] += dz.sum(axis=0)
        dh = dz @ params["Wh"].T
        dc = dc * f
    return loss, grads


# ---------------------------------------------------------------------------
# Autoencoder: F → H (ReLU) → F (linear), MSE — the nonlinear detector the
# reference builds at advanced_models.py:107-143 (ours is one bottleneck
# layer instead of three; the anomaly-score contract is identical:
# score(x) = reconstruction error).
# ---------------------------------------------------------------------------


def ae_init(n_features: int, hidden: int, seed: int = 11) -> dict:
    rng = np.random.Generator(np.random.PCG64(seed))
    f, h = n_features, hidden

    def glorot(shape):
        lim = math.sqrt(6.0 / (shape[0] + shape[1]))
        return rng.uniform(-lim, lim, size=shape)

    return {
        "W1": glorot((f, h)),
        "b1": np.zeros(h),
        "W2": glorot((h, f)),
        "b2": np.zeros(f),
    }


def ae_reconstruct(params: dict, X: np.ndarray) -> np.ndarray:
    hidden = np.maximum(X @ params["W1"] + params["b1"], 0.0)
    return hidden @ params["W2"] + params["b2"]


def ae_loss_and_grads(params: dict, X: np.ndarray, _y=None):
    """SUM-reduced squared error (Σ over rows of ||x − x̂||²/F) and grads."""
    B, f = X.shape
    pre = X @ params["W1"] + params["b1"]
    hidden = np.maximum(pre, 0.0)
    recon = hidden @ params["W2"] + params["b2"]
    diff = recon - X
    loss = np.sum(diff * diff) / f
    dre = 2.0 * diff / f  # (B, F)
    grads = {
        "W2": hidden.T @ dre,
        "b2": dre.sum(axis=0),
    }
    dhid = (dre @ params["W2"].T) * (pre > 0.0)
    grads["W1"] = X.T @ dhid
    grads["b1"] = dhid.sum(axis=0)
    return loss, grads


# ---------------------------------------------------------------------------
# Flat-vector param plumbing + Adam (driver-side, deterministic)
# ---------------------------------------------------------------------------


def flatten(params: dict) -> tuple[np.ndarray, list]:
    spec = [(k, params[k].shape) for k in sorted(params)]
    flat = np.concatenate([params[k].ravel() for k, _ in spec])
    return flat, spec


def unflatten(flat: np.ndarray, spec: list) -> dict:
    out, pos = {}, 0
    for k, shape in spec:
        n = int(np.prod(shape))
        out[k] = flat[pos : pos + n].reshape(shape)
        pos += n
    return out


class Adam:
    def __init__(self, n: int, lr: float = 0.01):
        self.lr, self.b1, self.b2, self.eps = lr, 0.9, 0.999, 1e-8
        self.m = np.zeros(n)
        self.v = np.zeros(n)
        self.t = 0

    def step(self, flat: np.ndarray, grad: np.ndarray) -> np.ndarray:
        self.t += 1
        self.m = self.b1 * self.m + (1 - self.b1) * grad
        self.v = self.b2 * self.v + (1 - self.b2) * grad * grad
        mh = self.m / (1 - self.b1**self.t)
        vh = self.v / (1 - self.b2**self.t)
        return flat - self.lr * mh / (np.sqrt(vh) + self.eps)


# ---------------------------------------------------------------------------
# Distributed epoch: per-bucket gradient sums via applyInPandas
# ---------------------------------------------------------------------------

_GRAD_SCHEMA = StructType(
    [
        StructField("pid", LongType()),
        StructField("grad", ArrayType(DoubleType())),
        StructField("loss", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _batch_xy(pdf, seq_shape):
    """Sort a bucket by key and stack its x column into the batch array."""
    pdf = pdf.sort_values("key", kind="mergesort")
    if seq_shape:  # (T, F) sequences stored as array<array<double>>
        X = np.array([np.stack(r) for r in pdf["x"]], dtype=np.float64)
    else:
        X = np.array([np.asarray(r) for r in pdf["x"]], dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64) if "y" in pdf else None
    return X, y


def _grad_kernel(flat_bc, spec, loss_and_grads, seq_shape):
    import pandas as pd

    def kernel(pdf):
        params = unflatten(np.asarray(flat_bc.value), spec)
        X, y = _batch_xy(pdf, seq_shape)
        loss, grads = loss_and_grads(params, X, y)
        gflat = np.concatenate([grads[k].ravel() for k, _ in spec])
        return pd.DataFrame(
            {
                "pid": [int(pdf["pid"].iloc[0])],
                "grad": [gflat.tolist()],
                "loss": [float(loss)],
                "n": [len(X)],
            }
        )

    return kernel


def train_distributed(
    data: DataFrame,
    init_params: dict,
    loss_and_grads,
    epochs: int = 12,
    lr: float = 0.01,
    seq: bool = True,
) -> tuple[dict, list]:
    """Data-parallel full-batch Adam. ``data`` has columns
    (pid bigint, key, x, [y]); it is cached by the caller. Returns the
    trained params and a [(epoch, mean_loss)] history. The per-epoch
    collect is n_buckets rows × n_params doubles — size-independent."""
    spark = data.sparkSession
    flat, spec = flatten(init_params)
    opt = Adam(len(flat), lr=lr)
    history = []
    for epoch in range(epochs):
        bc = spark.sparkContext.broadcast(flat.tolist())
        rows = (
            data.groupBy("pid")
            .applyInPandas(
                _grad_kernel(bc, spec, loss_and_grads, seq), _GRAD_SCHEMA
            )
            .collect()
        )
        bc.unpersist()
        rows.sort(key=lambda r: r["pid"])  # fixed fold order → deterministic
        n = sum(r["n"] for r in rows)
        grad = np.zeros(len(flat))
        loss = 0.0
        for r in rows:
            grad += np.asarray(r["grad"])
            loss += r["loss"]
        flat = opt.step(flat, grad / n)
        history.append((epoch, round(loss / n, 10)))
    return unflatten(flat, spec), history


# ---------------------------------------------------------------------------
# Sequence building (one window pass — same shape as sequence_lag_features)
# ---------------------------------------------------------------------------


def event_sequences(
    events: DataFrame,
    seq_len: int = 8,
    n_buckets: int = 16,
    sample_mod: int | None = None,
) -> DataFrame:
    """Per-event LSTM input: the entity's last ``seq_len`` events as a
    (T, 3) sequence [log1p(amount), log1p(gap_s), present], oldest step
    first, zero-padded like Keras pre-padding; label = the event is a
    purchase. One window pass (seq_len LAGs over one partition/sort);
    the array assembly is pure column expressions — no Python until the
    gradient kernel. ``sample_mod`` keeps every xxhash64(event_id) % mod
    == 0 row — a deterministic, cluster-size-independent subsample."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis(F.col("ts")), "event_id"
    )
    ms = F.unix_millis(F.col("ts"))
    steps = []
    for i in range(seq_len, 0, -1):  # oldest → newest
        lag_v = F.lag("value", i).over(w)
        gap_s = (ms - F.lag(ms, i).over(w)).cast("double") / F.lit(1000.0)
        steps.append(
            F.array(
                F.log1p(F.coalesce(lag_v, F.lit(0.0))),
                F.log1p(F.coalesce(gap_s, F.lit(0.0))),
                F.when(lag_v.isNull(), F.lit(0.0)).otherwise(F.lit(1.0)),
            )
        )
    out = events.select(
        F.col("event_id").alias("key"),
        F.pmod(F.xxhash64("event_id"), F.lit(n_buckets)).alias("pid"),
        F.array(*steps).alias("x"),
        (F.col("event_type") == "purchase").cast("double").alias("y"),
    )
    if sample_mod:
        out = out.where(
            F.pmod(F.xxhash64(F.col("key"), F.lit(97)), F.lit(sample_mod)) == 0
        )
    return out


def lstm_sequence_summary(
    events: DataFrame,
    seq_len: int = 8,
    hidden: int = 8,
    epochs: int = 12,
    lr: float = 0.05,
    sample_mod: int | None = 3,
    seed: int = 7,
) -> DataFrame:
    """Train the LSTM purchase-sequence classifier and return its history
    plus final train metrics as (stage, epoch, value) rows. Reference
    parity: models/advanced_models.py:144-172 (LSTM → dense sigmoid,
    binary cross-entropy); depth is scoped to one recurrent layer — the
    gate math, BPTT, and sequence semantics are the faithful part."""
    spark = events.sparkSession
    seqs = event_sequences(events, seq_len=seq_len, sample_mod=sample_mod)
    seqs = seqs.persist()
    try:
        params, history = train_distributed(
            seqs,
            lstm_init(3, hidden, seed=seed),
            lstm_loss_and_grads,
            epochs=epochs,
            lr=lr,
            seq=True,
        )
        flat, spec = flatten(params)
        bc = spark.sparkContext.broadcast(flat.tolist())

        def predict(iterator):
            import pandas as pd

            p = unflatten(np.asarray(bc.value), spec)
            for pdf in iterator:
                if len(pdf) == 0:
                    continue
                X = np.array(
                    [np.stack(r) for r in pdf["x"]], dtype=np.float64
                )
                prob, _ = lstm_forward(p, X)
                yield pd.DataFrame(
                    {
                        "correct": ((prob >= 0.5) == (pdf["y"] >= 0.5)).astype(
                            "int64"
                        ),
                        "pos": pdf["y"].astype("int64"),
                    }
                )

        acc_schema = StructType(
            [
                StructField("correct", LongType()),
                StructField("pos", LongType()),
            ]
        )
        agg = (
            seqs.mapInPandas(predict, acc_schema)
            .agg(
                F.sum("correct").alias("c"),
                F.sum("pos").alias("p"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        rows = [("train_loss", int(e), float(l)) for e, l in history]
        n = int(agg["n"])
        rows += [
            ("train_accuracy", epochs, round(int(agg["c"]) / n, 10)),
            ("positive_rate", epochs, round(int(agg["p"]) / n, 10)),
            ("n_sequences", epochs, float(n)),
            ("hidden_units", epochs, float(hidden)),
            ("seq_len", epochs, float(seq_len)),
        ]
    finally:
        seqs.unpersist()
    return spark.createDataFrame(rows, "stage string, epoch int, value double")


def _standard_scaled(
    feats: DataFrame, feature_cols: list[str], id_col: str
) -> DataFrame:
    """Deterministic standardization shared by the autoencoder paths:
    DECIMAL-summed moments → mean/std rounded to 6 dp (std 0 → 1.0), so
    the scaling is reproducible bit-for-bit on any cluster AND
    recomputable by the DuckDB oracle of autoencoder_iter0_contract.
    Returns (key = id string, pid = xxhash64 mod 16 bucket, x = scaled
    feature array)."""
    aggs = []
    for c in feature_cols:
        d = F.col(c).cast("decimal(25,6)")
        aggs += [
            F.sum(d).alias(f"s_{c}"),
            F.sum((d * d).cast("decimal(38,12)")).alias(f"q_{c}"),
        ]
    aggs.append(F.count(F.lit(1)).alias("_n"))
    stats = feats.na.fill(0, feature_cols).agg(*aggs).collect()[0]
    n_rows = int(stats["_n"])
    mean = {
        c: round(float(stats[f"s_{c}"]) / n_rows, 6) for c in feature_cols
    }
    std = {}
    for c in feature_cols:
        var = float(stats[f"q_{c}"]) / n_rows - mean[c] ** 2
        std[c] = round(math.sqrt(max(var, 1e-12)), 6) or 1.0

    return feats.na.fill(0, feature_cols).select(
        F.col(id_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(16)).alias(
            "pid"
        ),
        F.array(
            *[
                (F.col(c).cast("double") - F.lit(mean[c])) / F.lit(std[c])
                for c in feature_cols
            ]
        ).alias("x"),
    )


def autoencoder_forward_contract(
    feats: DataFrame,
    feature_cols: list[str],
    id_col: str = "user_id",
    hidden: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Iteration-0 forward pass of the autoencoder at the seeded Glorot
    init — the VALUE-contract slice of the otherwise rows-only trainer
    (r10, VERDICT #5): standardization (the production ``_standard_scaled``
    path), ``ae_init`` seeding, and ``ae_reconstruct`` are all exactly
    recomputable by SQL (ReLU = GREATEST(·, 0), linear maps with the init
    weights embedded as literals, mean/std via the DECIMAL idiom), so the
    DuckDB oracle re-derives every reconstruction component and the
    per-entity squared error from the base tables alone. The backward
    pass / Adam loop stay pytest-pinned (gradcheck + distributed-vs-local
    bit-equality) — they are iterative float recursions with no stable
    SQL form. Output: one row per entity, x̂ components and
    reconstruction error rounded to 6 dp (house float rule)."""
    import pandas as pd

    spark = feats.sparkSession
    f = len(feature_cols)
    params = ae_init(f, hidden, seed=seed)
    scaled = _standard_scaled(feats, feature_cols, id_col)
    flat, spec = flatten(params)
    bc = spark.sparkContext.broadcast(flat.tolist())

    def fwd(iterator):
        p = unflatten(np.asarray(bc.value), spec)
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(r) for r in pdf["x"]], dtype=np.float64)
            recon = ae_reconstruct(p, X)
            err = np.mean((recon - X) ** 2, axis=1)
            out = {"key": pdf["key"]}
            for j in range(X.shape[1]):
                out[f"xhat_{j}"] = np.round(recon[:, j], 6)
            out["recon_err_iter0"] = np.round(err, 6)
            yield pd.DataFrame(out)

    out_schema = (
        "key string, "
        + ", ".join(f"xhat_{j} double" for j in range(f))
        + ", recon_err_iter0 double"
    )
    return scaled.mapInPandas(fwd, out_schema).select(
        F.col("key").cast("long").alias(id_col),
        *[f"xhat_{j}" for j in range(f)],
        "recon_err_iter0",
    )


def mlp_init(layer_sizes: list[int], seed: int = 19) -> list[dict]:
    """Seeded Glorot init for the MLP forward contract — same PCG64
    sharing rule as :func:`ae_init` / the ASHA config space: import-time
    metadata, embedded as full-precision literals in the DuckDB oracle."""
    rng = np.random.Generator(np.random.PCG64(seed))
    out = []
    for a, b in zip(layer_sizes, layer_sizes[1:]):
        lim = math.sqrt(6.0 / (a + b))
        out.append(
            {"W": rng.uniform(-lim, lim, size=(a, b)), "b": np.zeros(b)}
        )
    return out


def mlp_forward(layers: list[dict], X: np.ndarray) -> np.ndarray:
    """ReLU hidden layers + linear 2-class head → (B, 2) logits."""
    h = X
    for p in layers[:-1]:
        h = np.maximum(h @ p["W"] + p["b"], 0.0)
    return h @ layers[-1]["W"] + layers[-1]["b"]


def mlp_forward_contract(
    feats: DataFrame,
    feature_cols: list[str],
    id_col: str = "user_id",
    hidden: tuple[int, ...] = (16, 8),
    seed: int = 19,
) -> DataFrame:
    """Iteration-0 forward pass of the feed-forward classifier at the
    seeded Glorot init — the VALUE-contract slice of the otherwise
    rows-only MLP trainer (r11, VERDICT #5, the autoencoder_iter0
    machinery applied to the classifier shape): production
    standardization (``_standard_scaled``), ``mlp_init`` seeding, two
    ReLU hidden layers (EXACT in SQL — GREATEST(·, 0) over chained
    linear maps, no transcendentals until the head), a linear 2-logit
    head, and the 2-class softmax probability
    p1 = 1/(1+exp(z0−z1)). The DuckDB oracle re-derives every logit and
    the probability from the base tables alone with the init weights as
    literals; logits and p1 round to 6 dp (house float rule — absorbs
    numpy-dot vs chained-addition ULPs, the same contract the AE twin
    certifies). The L-BFGS training loop stays honestly rows-only in
    mlp_training_summary."""
    import pandas as pd

    spark = feats.sparkSession
    f = len(feature_cols)
    layers = mlp_init([f, *hidden, 2], seed=seed)
    scaled = _standard_scaled(feats, feature_cols, id_col)
    bc = spark.sparkContext.broadcast(
        [(p["W"].tolist(), p["b"].tolist()) for p in layers]
    )

    def fwd(iterator):
        ps = [
            {"W": np.asarray(w), "b": np.asarray(b)} for w, b in bc.value
        ]
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(r) for r in pdf["x"]], dtype=np.float64)
            z = mlp_forward(ps, X)
            p1 = 1.0 / (1.0 + np.exp(z[:, 0] - z[:, 1]))
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "logit_0": np.round(z[:, 0], 6),
                    "logit_1": np.round(z[:, 1], 6),
                    "p_class1": np.round(p1, 6),
                }
            )

    out_schema = "key string, logit_0 double, logit_1 double, p_class1 double"
    return scaled.mapInPandas(fwd, out_schema).select(
        F.col("key").cast("long").alias(id_col),
        "logit_0",
        "logit_1",
        "p_class1",
    )


def autoencoder_scores(
    feats: DataFrame,
    feature_cols: list[str],
    id_col: str = "user_id",
    hidden: int = 4,
    epochs: int = 30,
    lr: float = 0.02,
    top_n: int = 32,
    seed: int = 11,
) -> DataFrame:
    """Nonlinear-autoencoder anomaly detector (advanced_models.py:107-143):
    standardize features (DECIMAL-summed moments so the scaling is
    reproducible), train the ReLU-bottleneck autoencoder data-parallel,
    score every row's reconstruction error in one broadcast pass, return
    the top ``top_n`` anomalies (error DESC, id ASC — deterministic).
    Complements pca_anomaly_scores (the linear detector): this one learns
    a nonlinear manifold, so it is the closer analog to the reference's
    Keras detector."""
    spark = feats.sparkSession
    f = len(feature_cols)
    scaled = _standard_scaled(feats, feature_cols, id_col)
    scaled = scaled.persist()
    try:
        params, _ = train_distributed(
            scaled,
            ae_init(f, hidden, seed=seed),
            ae_loss_and_grads,
            epochs=epochs,
            lr=lr,
            seq=False,
        )
        flat, spec = flatten(params)
        bc = spark.sparkContext.broadcast(flat.tolist())

        def score(iterator):
            import pandas as pd

            p = unflatten(np.asarray(bc.value), spec)
            for pdf in iterator:
                if len(pdf) == 0:
                    continue
                X = np.array(
                    [np.asarray(r) for r in pdf["x"]], dtype=np.float64
                )
                err = np.mean(
                    (ae_reconstruct(p, X) - X) ** 2, axis=1
                )
                yield pd.DataFrame(
                    {"key": pdf["key"], "recon_error": np.round(err, 8)}
                )

        out_schema = "key string, recon_error double"
        scored = scaled.mapInPandas(score, out_schema)
        return (
            scored.orderBy(F.desc("recon_error"), "key")
            .limit(top_n)
            .select(
                F.col("key").alias(id_col),
                "recon_error",
            )
        )
    finally:
        scaled.unpersist()


def lstm_forward_contract(
    events: DataFrame,
    seq_len: int = 8,
    hidden: int = 8,
    seed: int = 7,
    keep_mod: int = 7,
    keep_rem: int = 3,
) -> DataFrame:
    """Iteration-0 forward pass of the LSTM classifier at the seeded
    Glorot init — the VALUE-contract slice of the otherwise rows-only
    trainer (r10, VERDICT #5 second half): the PRODUCTION sequence
    builder (``event_sequences`` — the same one-window-pass LAG encoding
    the trainer consumes), ``lstm_init`` seeding, the faithful gate
    recurrence of ``lstm_forward``, and the per-row BCE are all exactly
    recomputable by SQL — the DuckDB oracle unrolls the eight timesteps
    (32 gate pre-activations, 8 cell and 8 hidden states per step) as
    chained CTEs with the init weights embedded as full-precision
    literals and re-derives every final hidden component, the purchase
    probability, and the per-event loss from the base events table
    alone. The BPTT/Adam LOOP stays pytest-pinned (finite-difference
    gradcheck + distributed-vs-local bit-equality) — an iterative float
    recursion with no stable SQL form. Output: one row per sampled
    event (``event_id % keep_mod == keep_rem`` — a deterministic,
    engine-agnostic subsample), final hidden state, probability and BCE
    rounded to 6 dp (house float rule; ``+ 0.0`` normalizes -0.0)."""
    import pandas as pd

    spark = events.sparkSession
    params = lstm_init(3, hidden, seed=seed)
    seqs = event_sequences(events, seq_len=seq_len, sample_mod=None).where(
        F.pmod(F.col("key"), F.lit(keep_mod)) == keep_rem
    )
    flat, spec = flatten(params)
    bc = spark.sparkContext.broadcast(flat.tolist())

    def fwd(iterator):
        p = unflatten(np.asarray(bc.value), spec)
        eps = 1e-12
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            X = np.array([np.stack(r) for r in pdf["x"]], dtype=np.float64)
            prob, (_, hs, _, _, _) = lstm_forward(p, X)
            y = pdf["y"].to_numpy(dtype=np.float64)
            bce = -(
                y * np.log(prob + eps) + (1.0 - y) * np.log(1.0 - prob + eps)
            )
            out = {"key": pdf["key"], "y": y}
            for m in range(hidden):
                out[f"h_{m}"] = np.round(hs[seq_len][:, m], 6) + 0.0
            out["prob_iter0"] = np.round(prob, 6) + 0.0
            out["bce_iter0"] = np.round(bce, 6) + 0.0
            yield pd.DataFrame(out)

    out_schema = (
        "key bigint, y double, "
        + ", ".join(f"h_{m} double" for m in range(hidden))
        + ", prob_iter0 double, bce_iter0 double"
    )
    return seqs.mapInPandas(fwd, out_schema).select(
        F.col("key").alias("event_id"),
        F.col("y").alias("label"),
        *[f"h_{m}" for m in range(hidden)],
        "prob_iter0",
        "bce_iter0",
    )
