"""Misra-Gries heavy hitters (operators/sketches.py).

Pins: the MG frequency bound (weight >= true - n/(k+1)) on adversarial
streams, the mergeable-summaries property, recovery of every item above
the guarantee threshold, and end-to-end exactness of the composed
top-k against a plain groupBy — including the adversarial layout where
naive per-partition top-k misses the global heavy hitter.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from aml_feature_store_spark.operators import sketches


def test_mg_bound_adversarial():
    # round-robin stream: no item ever keeps a counter for small k,
    # the classic MG worst case
    stream = [i % 17 for i in range(17 * 50)] + [99] * 400
    k = 8
    counters, n = sketches.misra_gries_partition(stream, k)
    true = Counter(stream)
    for item, w in counters.items():
        assert w <= true[item]
        assert w >= true[item] - n / (k + 1)
    # 99 has freq 400 > n/(k+1) = 1250/9 -> must be present
    assert 99 in counters


def test_merge_preserves_bound():
    rng = np.random.Generator(np.random.PCG64(3))
    streams = [
        list(rng.integers(0, 30, 500)) + [777] * 150 for _ in range(4)
    ]
    k = 10
    summaries = [sketches.misra_gries_partition(s, k) for s in streams]
    merged, n = sketches.merge_summaries(summaries, k)
    assert len(merged) <= k
    true = Counter(sum(streams, []))
    assert n == sum(len(s) for s in streams)
    for item, w in merged.items():
        assert w <= true[item]
        assert w >= true[item] - n / (k + 1)
    assert 777 in merged  # 600 occurrences > n/(k+1) = 2600/11


def test_exact_topk_matches_groupby(spark):
    rng = np.random.Generator(np.random.PCG64(11))
    vals = [f"u{int(v):03d}" for v in rng.zipf(1.5, 5000) % 500]
    df = spark.createDataFrame([(v,) for v in vals], "item string")
    got = sketches.heavy_hitters_exact_topk(df, "item", top_n=10, k=64).collect()
    true = Counter(vals).most_common()
    true.sort(key=lambda t: (-t[1], t[0]))
    expect = true[:10]
    assert [(r["item"], r["cnt"]) for r in got] == expect


def test_exact_topk_adversarial_partition_layout(spark):
    """The global heavy hitter is the per-partition minority everywhere:
    naive top-k-per-partition would drop it; the MG candidate pass must
    not."""
    rows = []
    # 8 'partitions-worth' of data: in each slice, locally-popular items
    # (distinct per slice) each appear 30x, the GLOBAL hitter only 20x
    for part in range(8):
        for local in range(6):
            rows += [(f"local_{part}_{local}",)] * 30
        rows += [("global_hitter",)] * 20
    df = spark.createDataFrame(rows, "item string").repartition(8, "item")
    got = sketches.heavy_hitters_exact_topk(df, "item", top_n=1, k=64).collect()
    # global total 160 > any local's 30
    assert got[0]["item"] == "global_hitter" and got[0]["cnt"] == 160


def test_exact_topk_deterministic_ties(spark):
    rows = [(f"t{i}",) for i in range(20)] * 5  # all counts equal
    df = spark.createDataFrame(rows, "item string")
    a = sketches.heavy_hitters_exact_topk(df, "item", top_n=7, k=64).collect()
    b = sketches.heavy_hitters_exact_topk(df, "item", top_n=7, k=64).collect()
    assert a == b
    assert [r["item"] for r in a] == sorted(r["item"] for r in a)


# --- HyperLogLog -----------------------------------------------------------


def test_hll_accuracy_across_cardinalities(spark):
    from aml_feature_store_spark.operators.sketches import hll_group_counts

    rows = []
    for g, card in (("small", 100), ("mid", 5_000), ("big", 60_000)):
        for i in range(card):
            rows.append((g, f"{g}_item_{i}"))
        # duplicates must not change the estimate
        for i in range(min(card, 500)):
            rows.append((g, f"{g}_item_{i}"))
    df = spark.createDataFrame(rows, "grp string, item string").repartition(8)
    got = {
        r["grp"]: r["hll_estimate"]
        for r in hll_group_counts(df, ["grp"], "item", p=12).collect()
    }
    for g, card in (("small", 100), ("mid", 5_000), ("big", 60_000)):
        assert abs(got[g] - card) / card < 0.05, (g, got[g])


def test_hll_rollup_registers_identical(spark):
    from aml_feature_store_spark.operators.sketches import hll_registers
    from pyspark.sql import functions as F

    rows = [
        ("a", day, f"u{(day * 97 + i) % 700}")
        for day in range(20)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, day int, item string")
    direct = {
        (r["grp"], r["reg_idx"]): r["reg_val"]
        for r in hll_registers(df, ["grp"], "item", p=10).collect()
    }
    per_day = hll_registers(df, ["grp", "day"], "item", p=10)
    rolled = {
        (r["grp"], r["reg_idx"]): r["reg_val"]
        for r in per_day.groupBy("grp", "reg_idx")
        .agg(F.max("reg_val").alias("reg_val"))
        .collect()
    }
    assert direct == rolled  # MAX-merge is exact, register by register


def test_hll_rho_computation(spark):
    """Pin rho against a pure-Python recomputation of the same xxhash64
    values Spark produced (seed 42 default) — catches any drift in the
    shift/mask/conv column algebra."""
    from aml_feature_store_spark.operators.sketches import hll_registers
    from pyspark.sql import functions as F

    p = 12
    df = spark.createDataFrame(
        [(f"key_{i}",) for i in range(2_000)], "item string"
    )
    hashed = df.select("item", F.xxhash64("item").alias("h")).collect()
    expect: dict[int, int] = {}
    for r in hashed:
        h = r["h"] & 0xFFFFFFFFFFFFFFFF  # two's complement -> unsigned
        idx = h >> (64 - p)
        w = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) + 1 - w.bit_length()
        expect[idx] = max(expect.get(idx, 0), rho)
    got = {
        r["reg_idx"]: r["reg_val"]
        for r in hll_registers(df.withColumn("g", F.lit("x")), ["g"], "item", p).collect()
    }
    assert got == expect


# --- Count-min -------------------------------------------------------------


def test_countmin_never_undershoots_and_rollup_exact(spark):
    from pyspark.sql import functions as F

    from aml_feature_store_spark.operators.sketches import (
        countmin_lookup,
        countmin_table,
    )

    # adversarial: tiny w forces collisions; undershoot must still be 0
    d, w = 3, 16
    rows = [(f"item_{i % 40}", i % 7) for i in range(5_000)]
    df = spark.createDataFrame(rows, "item string, day int").repartition(6)
    cm = countmin_table(df, "item", d, w)
    est = countmin_lookup(cm, df, "item", d, w)
    exact = df.groupBy("item").agg(F.count(F.lit(1)).alias("exact"))
    j = est.join(exact, "item").collect()
    assert len(j) == 40
    n = len(rows)
    for r in j:
        assert r["_n_probes"] == d  # every probe row found a counter
        assert r["cm_estimate"] >= r["exact"]  # CM never undershoots
        assert r["cm_estimate"] <= r["exact"] + n  # trivial sanity cap
    # per-day rollup merged by SUM is counter-identical to direct build
    direct = {
        (r["cm_row"], r["cm_bucket"]): r["cnt"] for r in cm.collect()
    }
    rolled_rows = (
        countmin_table(df, "item", d, w, extra_group_cols=["day"])
        .groupBy("cm_row", "cm_bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    rolled = {(r["cm_row"], r["cm_bucket"]): r["cnt"] for r in rolled_rows}
    assert direct == rolled
    # total mass per hash row == number of input rows
    per_row = {}
    for (row_idx, _), c in direct.items():
        per_row[row_idx] = per_row.get(row_idx, 0) + c
    assert per_row == {r: n for r in range(d)}


def test_bloom_zero_false_negatives_and_fp_rate(spark):
    from aml_feature_store_spark.operators.sketches import bloom_bits, bloom_probe

    members = spark.createDataFrame(
        [(f"member_{i}",) for i in range(2_000)], "item string"
    ).repartition(5)
    n, k = 2_000, 11
    m = 16 * n
    bits = bloom_bits(members, "item", m, k)
    # probe members + disjoint nonmembers
    probes = spark.createDataFrame(
        [(f"member_{i}",) for i in range(2_000)]
        + [(f"stranger_{i}",) for i in range(8_000)],
        "item string",
    ).repartition(7)
    flags = {r["item"]: r["bloom_positive"] for r in bloom_probe(bits, probes, "item", m, k).collect()}
    assert len(flags) == 10_000
    # structural: every member positive
    assert all(flags[f"member_{i}"] for i in range(2_000))
    # FP rate ~ (1-e^{-kn/m})^k ~ 4.5e-4 -> expect ~3.6 of 8000; allow 5 sigma
    fp = sum(flags[f"stranger_{i}"] for i in range(8_000))
    assert fp <= 8_000 * 4.5e-4 + 5 * (8_000 * 4.5e-4) ** 0.5 + 1


def test_bloom_rollup_or_merge_identical_and_layout_invariant(spark):
    from aml_feature_store_spark.operators.sketches import bloom_bits

    rows = [(f"item_{i % 300}", i % 9) for i in range(3_000)]
    df = spark.createDataFrame(rows, "item string, day int")
    m, k = 4_096, 7
    direct = {r["bit_pos"] for r in bloom_bits(df, "item", m, k).collect()}
    # per-day OR-merge (DISTINCT union) is set-identical to direct build
    per_day = bloom_bits(df, "item", m, k, extra_group_cols=["day"])
    merged = {r["bit_pos"] for r in per_day.select("bit_pos").distinct().collect()}
    assert direct == merged
    # bit set is a pure function of the member SET: layout + dup invariant
    shuffled = {
        r["bit_pos"]
        for r in bloom_bits(
            df.union(df).repartition(13), "item", m, k
        ).collect()
    }
    assert direct == shuffled
    assert len(direct) <= min(m, k * 300)


def test_incremental_agg_merge_handles_one_sided_users(spark, tmp_path):
    """Users present only in state (inactive today) or only in delta
    (brand-new) must survive the full-outer merge — live testdata has
    every user active daily, so the gate can't exercise the coalesce
    arms; this pins them."""
    import datetime

    from aml_feature_store_spark.queries.coverage import (
        incremental_agg_maintenance,
    )

    rows = [
        # user 1: both days; user 2: old only; user 3: last day only
        (1, 1, datetime.datetime(2026, 1, 1, 10), "view", 10.0, "{}"),
        (2, 1, datetime.datetime(2026, 1, 2, 10), "view", 30.0, "{}"),
        (3, 2, datetime.datetime(2026, 1, 1, 11), "view", 5.0, "{}"),
        (4, 3, datetime.datetime(2026, 1, 2, 12), "view", 7.5, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(p)
    # the loader expects <dir>/events.parquet
    out = {
        r["user_id"]: r
        for r in incremental_agg_maintenance(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_events"] == 2 and out[1]["sum_value"] == 40.0
    assert out[1]["max_value"] == 30.0 and out[1]["min_value"] == 10.0
    assert out[2]["n_events"] == 1 and out[2]["sum_value"] == 5.0   # state-only
    assert out[3]["n_events"] == 1 and out[3]["sum_value"] == 7.5   # delta-only
