"""One-pass mergeable frequency sketches with exact verification
(SURVEY §2.4 approximate-aggregate adjacents; companion to the HLL
distinct-count and GK-quantile surfaces).

Misra-Gries heavy hitters, the classic mergeable summary: each
partition keeps at most ``k`` counters (decrement-all when full), the
driver merges the per-partition summaries (merge = add counters, then
subtract the (k+1)-th largest weight from all and drop non-positive —
the standard mergeable-summaries result, Agarwal et al., PODS'12).
The guarantee: every item with true frequency > n/(k+1) survives into
the candidate set. A second broadcast-semi-join pass computes EXACT
counts for the ≤k candidates, so the composed operator returns the
exact top-``top_n`` — same exactness-from-pruning trick as the
bucketed near-dup join — while the first pass is one scan with O(k)
memory per partition and the second scans with a broadcast hash filter
(no shuffle of the raw keys at any point).

At 100 TB this is THE shape for "top URLs / domains / tokens": the
full groupBy alternative shuffles every distinct key; this shuffles
nothing and collects 2·k·n_partitions counter rows once.

Reference scope: the reference's pandas value_counts().head(n)
(feature_engineering/batch_features.py top-categories patterns) is the
semantic being reproduced; Misra-Gries is the public streaming
re-expression of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SUMMARY_SCHEMA = StructType(
    [
        StructField("item", StringType()),
        StructField("weight", LongType()),
        StructField("n_rows", LongType()),
    ]
)


def misra_gries_partition(items, k: int):
    """Pure-Python MG summary of an iterable of hashables: at most ``k``
    counters; returns (dict item -> weight, n_seen). Property-tested:
    weight[i] >= true_count[i] - n/(k+1)."""
    counters: dict = {}
    n = 0
    for it in items:
        n += 1
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters, n


def merge_summaries(summaries: list[tuple[dict, int]], k: int):
    """Merge MG summaries (Agarwal et al.): sum counters, then keep the
    k largest after subtracting the (k+1)-th largest weight. The merged
    summary keeps the same n/(k+1) error bound over the combined
    stream. Deterministic: ties in the weight order break on the item."""
    merged: dict = {}
    n = 0
    for counters, part_n in summaries:
        n += part_n
        for item, w in counters.items():
            merged[item] = merged.get(item, 0) + w
    if len(merged) > k:
        ranked = sorted(merged.items(), key=lambda t: (-t[1], str(t[0])))
        cut = ranked[k][1]  # (k+1)-th largest weight
        merged = {
            item: w - cut for item, w in ranked[:k] if w - cut > 0
        }
    return merged, n


def heavy_hitters_exact_topk(
    df: DataFrame,
    item_col: str,
    top_n: int = 10,
    k: int = 64,
) -> DataFrame:
    """Exact top-``top_n`` most frequent values of ``item_col`` without
    shuffling the raw keys: MG candidate pass (mapInPandas, O(k) state
    per partition, one summary row per counter) → driver merge →
    broadcast candidate filter → exact counts. ``k`` must be
    > n/true_freq(top_n-th item) for exactness; with the default 64 the
    pytest property test pins that every item above n/(k+1) frequency is
    recovered, and the exactness of the final counts holds regardless
    (missing a candidate requires its frequency <= n/(k+1))."""
    items = df.select(
        F.col(item_col).cast("string").alias("item")
    ).where(F.col(item_col).isNotNull())

    def mg(iterator):
        import pandas as pd

        summary: dict = {}
        n = 0
        for pdf in iterator:
            n += len(pdf)
            # per-Arrow-batch exact counts (vectorized), merged into the
            # running summary with the Agarwal merge — each batch is a
            # trivially-exact sub-summary, so the bound still holds
            vc = pdf["item"].value_counts()
            summary, _ = merge_summaries(
                [(summary, 0), (vc.to_dict(), 0)], k
            )
        yield pd.DataFrame(
            {
                "item": list(summary) or [None],
                "weight": list(summary.values()) or [0],
                "n_rows": [n] + [0] * (max(len(summary), 1) - 1),
            }
        )

    rows = items.mapInPandas(mg, _SUMMARY_SCHEMA).collect()
    # counter addition is associative, so the per-partition rows merge
    # in one shot; the final (k+1)-th-weight cut preserves the bound
    merged: dict = {}
    n = 0
    for r in rows:
        n += r["n_rows"]
        if r["item"] is not None:
            merged[r["item"]] = merged.get(r["item"], 0) + r["weight"]
    merged, _ = merge_summaries([(merged, 0)], k)
    candidates = sorted(merged)
    spark = df.sparkSession
    cand_df = spark.createDataFrame(
        [(c,) for c in candidates], "item string"
    )
    exact = (
        items.join(F.broadcast(cand_df), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "item")
        .limit(top_n)
    )
    return exact.select("item", "cnt")


def heavy_hitters_sql(item_expr: str, table: str, top_n: int = 10) -> str:
    """DuckDB mirror: the plain exact top-n (the MG pass only prunes)."""
    return f"""
SELECT CAST({item_expr} AS VARCHAR) AS item, COUNT(*) AS cnt
FROM {table}
WHERE {item_expr} IS NOT NULL
GROUP BY 1
ORDER BY cnt DESC, item
LIMIT {top_n}
"""


# --- HyperLogLog (Flajolet et al. 2007; HLL++ 64-bit variant) --------------
#
# Completes the mergeable-sketch family: Misra-Gries (frequency),
# t-digest (quantiles, operators/tdigest.py), HLL (cardinality).  Spark's
# approx_count_distinct is HLL++ too, but its partial state is opaque —
# these registers are a first-class VALUE (rows of (group, reg_idx,
# reg_val)) that can be persisted per (group, day) and re-aggregated with
# a plain MAX, which is the 100 TB rollup shape: count distinct users
# over any date range by merging tiny register tables, never rescanning
# the raw events.
#
# Everything is JVM-side column algebra (xxhash64 -> register index via
# unsigned shift, rho via the binary-string length of the remaining
# bits) — no Python in the pipeline, so the sketch pass is one scan and
# one (group, reg_idx) shuffle of at most m rows per group.


def hll_registers(
    df: DataFrame, group_cols: list[str], item_col: str, p: int = 12
) -> DataFrame:
    """HLL registers per group: reg_idx = top p bits of xxhash64(item),
    reg_val = max over items of rho(remaining 64-p bits) where rho =
    1 + leading zeros. Absent rows mean register value 0. Deterministic
    (fixed-seed xxhash64), mergeable by MAX on reg_val."""
    rest_bits = 64 - p
    h = F.xxhash64(F.col(item_col))
    idx = F.shiftrightunsigned(h, rest_bits).alias("reg_idx")
    w = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    # bit_length(w) via the base-2 string (exact for < 2^63); w == 0 -> 0
    bitlen = F.when(w == F.lit(0), F.lit(0)).otherwise(
        F.length(F.conv(w, 10, 2))
    )
    rho = (F.lit(rest_bits + 1) - bitlen).alias("rho")
    return (
        df.where(F.col(item_col).isNotNull())
        .groupBy(*group_cols, idx)
        .agg(F.max(rho).cast("int").alias("reg_val"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], p: int = 12) -> DataFrame:
    """Cardinality estimate from register rows: raw HLL harmonic mean
    with the linear-counting small-range correction (no large-range
    correction needed with 64-bit hashes). Pure column algebra."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg_val"))).alias("_z_present"),
    )
    z = F.col("_z_present") + (F.lit(m) - F.col("_n_regs"))
    e_raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - F.col("_n_regs")  # registers still at 0
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(e_raw)
    return agg.select(*group_cols, est.alias("hll_estimate"))


def hll_group_counts(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    p: int = 12,
    rollup_col: str | None = None,
) -> DataFrame:
    """Distinct-count estimates per group. With ``rollup_col`` the
    registers are first built per (group, rollup) — the persistable
    shape — then merged with MAX across the rollup dimension; because
    MAX is associative the merged registers are bit-identical to the
    direct build (pinned in tests), so the two paths return the exact
    same estimate."""
    if rollup_col:
        per = hll_registers(df, group_cols + [rollup_col], item_col, p)
        regs = per.groupBy(*group_cols, "reg_idx").agg(
            F.max("reg_val").alias("reg_val")
        )
    else:
        regs = hll_registers(df, group_cols, item_col, p)
    return hll_estimate(regs, group_cols, p)


# --- Count-min (Cormode & Muthukrishnan 2005) ------------------------------
#
# Point-frequency estimates for ALL items (Misra-Gries only answers the
# heavy ones): d hash rows x w buckets of additive counters.  Like the
# HLL registers the sketch is a first-class table of
# (row, bucket, count) rows, merged by plain SUM — integer addition, so
# a per-day rollup is BIT-identical to the direct build, not just
# approximately equal.  Build is one scan with map-side combine: each
# input row explodes to d (row, bucket) pairs that partially aggregate
# to at most d*w rows per partition before the shuffle.


def countmin_table(
    df: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 8192,
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """CM counters: row r uses xxhash64(r, item) mod w. Returns rows of
    (*extra_group_cols, cm_row, cm_bucket, cnt)."""
    extra = extra_group_cols or []
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("cm_row"),
                F.pmod(
                    F.xxhash64(F.lit(r), F.col(item_col)), F.lit(w)
                ).alias("cm_bucket"),
            )
            for r in range(d)
        ]
    )
    return (
        df.where(F.col(item_col).isNotNull())
        .select(*extra, F.explode(pairs).alias("e"))
        .groupBy(*extra, F.col("e.cm_row").alias("cm_row"), F.col("e.cm_bucket").alias("cm_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_lookup(
    table: DataFrame, items: DataFrame, item_col: str, d: int = 4, w: int = 8192
) -> DataFrame:
    """Point estimates for each distinct item in ``items``: join the d
    (row, bucket) probes against the counter table, take the min."""
    probes = items.select(item_col).distinct().select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cm_row"),
                        F.pmod(
                            F.xxhash64(F.lit(r), F.col(item_col)), F.lit(w)
                        ).alias("cm_bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("e"),
    ).select(item_col, "e.cm_row", "e.cm_bucket")
    return (
        probes.join(table, ["cm_row", "cm_bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cm_estimate"), F.count(F.lit(1)).alias("_n_probes"))
    )


# --- Bloom filter (Bloom 1970) ---------------------------------------------
#
# Membership pre-filter: the 100 TB dedup/routing shape ("has this doc
# digest been ingested already?") where a compact bit set screens a huge
# probe stream before any expensive exact join.  Like the HLL registers
# and the CM counters, the sketch is a first-class table — here of SET
# BIT POSITIONS — merged by DISTINCT union (bitwise OR), so a per-day
# rollup is set-identical to the direct build, not just approximately
# equal.  Structurally zero false negatives; false positives at the
# standard (1 - e^{-kn/m})^k rate.  The bits table holds at most
# min(m, k*n) rows; size m for the target FP rate (bits-per-member ~16,
# k = 11 ≈ (m/n)·ln 2 gives ~4.5e-4) and broadcast it to the probe
# side — at cluster scale where m outgrows the broadcast threshold the
# probe join degrades gracefully to a shuffled equi-join on bit_pos.


def _bloom_positions(item_col: str, m: int, k: int) -> Column:
    """The k bit positions of an item: pmod(xxhash64(r, item), m) for
    hash row r — same fixed-seed hash family as the CM sketch, so the
    bit set is a pure function of the member SET (dedup-safe, stable
    across partitionings and insert order)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(r), F.col(item_col)), F.lit(m))
            for r in range(k)
        ]
    )


def bloom_bits(
    df: DataFrame,
    item_col: str,
    m: int,
    k: int,
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Set-bit table (*extra_group_cols, bit_pos) of the Bloom filter
    over ``df[item_col]``.  One scan; the explode pre-aggregates to at
    most m rows per partition before the distinct's shuffle."""
    extra = extra_group_cols or []
    return (
        df.where(F.col(item_col).isNotNull())
        .select(*extra, F.explode(_bloom_positions(item_col, m, k)).alias("bit_pos"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame, items: DataFrame, item_col: str, m: int, k: int
) -> DataFrame:
    """Membership flags for each distinct item in ``items``: positive
    iff ALL k bit positions are set.  ``bits`` is broadcast (≤ m rows)."""
    probes = (
        items.select(item_col)
        .distinct()
        .select(
            item_col,
            F.explode(_bloom_positions(item_col, m, k)).alias("bit_pos"),
        )
    )
    hits = probes.join(
        F.broadcast(bits.select("bit_pos").withColumn("_hit", F.lit(1))),
        "bit_pos",
        "left",
    )
    return hits.groupBy(item_col).agg(
        (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) == F.lit(k)).alias(
            "bloom_positive"
        )
    )
