"""Property-based test (hypothesis): trailing-window features ≡ a brute
force per-row loop on arbitrary event sets — boundary conditions, ties,
duplicates, multi-entity interleaving all covered by generation."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aml_feature_store_spark.operators.windows import (
    TrailingWindowSpec,
    trailing_features,
)

T0 = dt.datetime(2024, 1, 1)
WINDOW_S = 600

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3600),  # seconds offset (ties likely)
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=1, max_value=99999),  # cents
    ),
    min_size=1,
    max_size=40,
)


def _brute_force(rows, window_s):
    out = {}
    for i, (s, u, cents) in enumerate(rows):
        frame = [
            c for (s2, u2, c) in rows if u2 == u and s - window_s <= s2 <= s
        ]
        out[i] = (len(frame), round(sum(frame) / 100.0, 2), max(frame) / 100.0,
                  min(frame) / 100.0)
    return out


@pytest.mark.usefixtures("spark")
@given(rows=events_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_trailing_matches_brute_force(spark, rows):
    df = spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, c / 100.0)
            for i, (s, u, c) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    spec = TrailingWindowSpec(windows={"w": WINDOW_S})
    got = {r["event_id"]: r for r in trailing_features(df, spec).collect()}
    want = _brute_force(rows, WINDOW_S)
    for i, (n, s, mx, mn) in want.items():
        g = got[i]
        assert g["txn_count_w"] == n, (i, rows)
        assert g["txn_amount_sum_w"] == pytest.approx(s, abs=1e-9), (i, rows)
        assert g["max_txn_amount_w"] == pytest.approx(mx), (i, rows)
        assert g["min_txn_amount_w"] == pytest.approx(mn), (i, rows)
