"""global_cumsum: distributed two-pass prefix sums vs a naive single-
partition window — must agree exactly, and must not contain any
unpartitioned window over the data relation."""

from __future__ import annotations

import pytest

from pyspark.sql import Window, functions as F

from aml_feature_store_spark.operators.prefix import global_cumsum


@pytest.fixture(scope="module")
def sample(spark):
    # distinct keys (callers pre-aggregate), skewed counts, negatives
    rows = [(float(i % 97) + i / 1000.0, i % 7, (i * 13) % 11 - 5) for i in range(5000)]
    return spark.createDataFrame(rows, ["v", "ca", "cb"]).cache()


def test_matches_single_partition_window(sample):
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    expected = sample.select(
        "v",
        F.sum("ca").over(w).alias("e_ca"),
        F.sum("cb").over(w).alias("e_cb"),
    )
    got = global_cumsum(sample, "v", ["ca", "cb"], buckets=8)
    joined = got.join(expected, "v")
    bad = joined.filter(
        (F.col("cum_ca") != F.col("e_ca")) | (F.col("cum_cb") != F.col("e_cb"))
    ).count()
    assert bad == 0
    tot = got.select("tot_ca", "tot_cb").first()
    exp_tot = sample.agg(F.sum("ca"), F.sum("cb")).first()
    assert (tot[0], tot[1]) == (exp_tot[0], exp_tot[1])


def test_single_bucket_degenerate(sample):
    tiny = sample.limit(3)
    got = global_cumsum(tiny, "v", ["ca"], buckets=1)
    assert got.count() == 3


def test_no_single_partition_window(sample):
    plan = global_cumsum(sample, "v", ["ca"], buckets=8)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_b" in line, f"unpartitioned window in plan: {line}"

def test_empty_input_returns_empty_with_schema(spark, sample):
    empty = sample.limit(0)
    got = global_cumsum(empty, "v", ["ca", "cb"], buckets=8)
    assert got.count() == 0
    for c in ("cum_ca", "cum_cb", "tot_ca", "tot_cb"):
        assert c in got.columns


def test_global_cumsum_fractional_column_offsets(spark):
    """Regression (r5): a DOUBLE sum column used to break createDataFrame
    inside global_cumsum — bucket offsets started at Python int 0, later
    rows were floats, and schema inference refused to merge Long/Double.
    Fractional columns must cumsum exactly across bucket boundaries."""
    from aml_feature_store_spark.operators.prefix import global_cumsum

    rows = [(i, 0.5 * (i % 7) - 1.5) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = (
        global_cumsum(df, "k", ["v"], buckets=8)
        .orderBy("k")
        .collect()
    )
    running = 0.0
    for r in out:
        running += 0.5 * (r["k"] % 7) - 1.5
        assert abs(r["cum_v"] - running) < 1e-9, r["k"]
    assert abs(out[-1]["tot_v"] - running) < 1e-9
