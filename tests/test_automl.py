"""ASHA successive-halving tuner (operators/training.asha_tuning_summary).

No SQL oracle (GBT split selection is engine-specific); what IS checkable:
the ladder's structural invariants, the promotion rule, and determinism.
"""

from __future__ import annotations

import numpy as np
import pytest

from aml_feature_store_spark.operators import training


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.Generator(np.random.PCG64(5))
    rows = []
    for i in range(300):
        x1, x2 = rng.normal(size=2)
        label = float(x1 + 0.5 * x2 + rng.normal(0, 0.3) > 0)
        rows.append((f"id{i:04d}", float(x1), float(x2), label))
    return spark.createDataFrame(
        rows, "rid string, x1 double, x2 double, y double"
    ).persist()


def _run(toy, **kw):
    return training.asha_tuning_summary(
        toy, ["x1", "x2"], "y", id_col="rid", **kw
    ).collect()


def test_asha_ladder_structure(toy):
    rows = _run(toy, n_configs=6, eta=3, min_iter=3, n_rungs=3)
    by_rung = {}
    for r in rows:
        by_rung.setdefault(r["rung"], []).append(r)
    # field shrinks 1/eta per rung, budget grows eta x
    assert [len(by_rung[r]) for r in sorted(by_rung)] == [6, 2, 1]
    assert [by_rung[r][0]["budget_iters"] for r in sorted(by_rung)] == [3, 9, 27]
    # promoted rows are exactly the top-AUC (ties by config_id) of the rung
    for rung in (0, 1):
        ranked = sorted(
            by_rung[rung], key=lambda r: (-r["val_auc"], r["config_id"])
        )
        n_keep = max(len(ranked) // 3, 1)
        assert {r["config_id"] for r in ranked[:n_keep]} == {
            r["config_id"] for r in by_rung[rung] if r["promoted"]
        }
    # survivors of rung r appear in rung r+1
    assert {r["config_id"] for r in by_rung[1]} == {
        r["config_id"] for r in by_rung[0] if r["promoted"]
    }
    # final rung never promotes (ladder ends)
    assert not any(r["promoted"] for r in by_rung[2])


def test_asha_deterministic_and_seed_sensitive(toy):
    a = _run(toy, n_configs=4, eta=2, min_iter=3, n_rungs=2, seed=7)
    b = _run(toy, n_configs=4, eta=2, min_iter=3, n_rungs=2, seed=7)
    assert a == b
    c = _run(toy, n_configs=4, eta=2, min_iter=3, n_rungs=2, seed=8)
    cfg = lambda rows: [
        (r["max_depth"], r["step_size"], r["subsample"]) for r in rows
        if r["rung"] == 0
    ]
    assert cfg(a) != cfg(c)  # the space is actually sampled from the seed


def test_asha_winner_is_reasonable(toy):
    rows = _run(toy, n_configs=4, eta=2, min_iter=4, n_rungs=2)
    final = [r for r in rows if r["rung"] == 1]
    # the data is separable-ish; the surviving configs should rank well
    assert all(r["val_auc"] > 0.6 for r in final)


def test_asha_oracle_recomputes_ladder_from_aucs():
    """r10 oracle contract: _asha_ladder_sql rebuilds the ENTIRE ladder
    (membership, budgets, promotions) in DuckDB from only the exported
    per-(rung, config) AUCs — pinned here on a synthetic AUC table with a
    known promotion order, plus the detection property: permuting two
    rung-0 AUCs flips the recomputed promotions/membership."""
    import re

    import duckdb

    from aml_feature_store_spark.queries.training import _asha_ladder_sql

    sql = _asha_ladder_sql()
    synth = (
        "(VALUES (0, 0, 0.9), (0, 1, 0.8), (0, 2, 0.7), (0, 3, 0.6), "
        "(1, 0, 0.95), (1, 1, 0.85), (2, 0, 0.99)) "
        "AS t(rung, config_id, val_auc)"
    )
    patched = re.sub(r"read_parquet\('[^']*'\)", synth, sql)
    assert patched != sql
    df = (
        duckdb.sql(patched)
        .df()
        .sort_values(["rung", "config_id"])
        .reset_index(drop=True)
    )
    assert len(df) == 7
    assert df.budget_iters.tolist() == [2, 2, 2, 2, 4, 4, 8]
    promoted = {
        (int(r.rung), int(r.config_id)): bool(r.promoted)
        for r in df.itertuples()
    }
    assert promoted == {
        (0, 0): True, (0, 1): True, (0, 2): False, (0, 3): False,
        (1, 0): True, (1, 1): False, (2, 0): False,
    }
    # mutation: swap configs 1 and 2 at rung 0 -> oracle expects rung-1
    # membership {0, 2}, so the exported rung-1 AUC for config 1 orphans
    # (NULL val_auc) and config 2 appears instead — a red hash either way
    mut = synth.replace("(0, 1, 0.8), (0, 2, 0.7)", "(0, 1, 0.7), (0, 2, 0.8)")
    df2 = duckdb.sql(re.sub(r"read_parquet\('[^']*'\)", mut, sql)).df()
    r1 = df2[df2.rung == 1]
    assert set(r1.config_id) == {0, 2}
    assert r1[r1.config_id == 2].val_auc.isna().all()
