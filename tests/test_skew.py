"""Salted aggregation must be exactly equivalent to the direct plan."""

from __future__ import annotations

from aml_feature_store_spark.operators.skew import (
    direct_agg_sum_count,
    salted_agg_sum_count,
)
from aml_feature_store_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_equals_direct(spark):
    df = load_table(spark, SF_DIR, "events")
    direct = {r["user_id"]: r for r in direct_agg_sum_count(df, "user_id", "value").collect()}
    salted = {r["user_id"]: r for r in salted_agg_sum_count(df, "user_id", "value").collect()}
    assert set(direct) == set(salted)
    for k, d in direct.items():
        s = salted[k]
        # decimal partials: bit-identical, not approximately equal
        assert s["sum_value"] == d["sum_value"]
        assert s["n_rows"] == d["n_rows"]
        assert s["min_value"] == d["min_value"]
        assert s["max_value"] == d["max_value"]
