"""Registered queries: remaining §2 surface — cumulative windows (W4),
global top-k (O2), pivot, ROLLUP grouping sets, timestamp scalar functions
(F1/F3), salted skew-safe aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import register
from ..operators.skew import salted_agg_sum_count
from ..sources import load_table

DEC = "decimal(25,2)"


@register(
    "running_totals_per_user",
    oracle="""
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) OVER
    (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_amount,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    AS txn_index
FROM events
""",
)
def running_totals_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative amount + ordinal per user (W4 rowsBetween-unbounded frame;
    reference nb:cell6 l.71 Gini cumsum)."""
    df = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis(F.col("ts")), F.col("event_id")
    )
    return df.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_amount"),
        F.row_number().over(w).cast("long").alias("txn_index"),
    )


@register(
    "top_events_global",
    oracle="""
SELECT event_id, user_id, value FROM events
ORDER BY value DESC, event_id LIMIT 20
""",
)
def top_events_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 by amount (O2): orderBy+limit compiles to
    TakeOrderedAndProject — no full sort materialization."""
    df = load_table(spark, sf_dir, "events")
    return (
        df.select("event_id", "user_id", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(20)
    )


@register(
    "event_type_pivot",
    oracle="""
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id
""",
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → count columns per user (wide feature encoding;
    explicit value list so the plan is a single aggregation, no
    distinct-scan first)."""
    df = load_table(spark, sf_dir, "events")
    return (
        df.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "revenue_rollup_region_nation",
    oracle="""
SELECT COALESCE(r.r_name, 'ALL') AS region, COALESCE(n.n_name, 'ALL') AS nation,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def revenue_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over the star join: (region, nation), (region),
    () subtotals in one pass — the dashboard drill-down shape (A21/A25)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "timestamp_functions",
    oracle="""
SELECT event_id,
  strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS iso_ts,
  epoch_ms(ts) AS epoch_millis,
  CAST(epoch_ms(ts + INTERVAL 1 HOUR) AS BIGINT) AS epoch_plus_1h,
  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
  hour(ts) * 3600 + minute(ts) * 60 + CAST(floor(second(ts)) AS INT)
    AS seconds_of_day
FROM events
""",
)
def timestamp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp scalar-function surface (F1/F3): ISO formatting, epoch-ms
    round-trip, interval arithmetic, date truncation, seconds-of-day —
    the parse/format pairs the reference scatters across producer/jobs
    (ISO8601+'Z' wire format, epoch-ms state keys)."""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")).alias(
            "iso_ts"
        ),
        F.unix_millis(F.col("ts")).alias("epoch_millis"),
        F.unix_millis(F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias(
            "epoch_plus_1h"
        ),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        (
            F.hour("ts") * 3600 + F.minute("ts") * 60
            + F.floor(F.second("ts")).cast("int")
        ).cast("int").alias("seconds_of_day"),
    )


@register(
    "seeded_sample",
    oracle="""
SELECT event_id, user_id, value FROM events
WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':42'), 1, 8)) AS BIGINT) % 10 = 0
""",
)
def seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 10% sample (O4; reference advanced_features.py:399
    df.sample(n, random_state=42)) as a DETERMINISTIC content hash —
    md5(event_id || seed) bucket — instead of engine-specific Bernoulli
    RNG, so the sample is identical on any engine, any partitioning, any
    cluster size (and therefore oracle-checkable bit-exactly). The same
    md5-mod idiom as curate_training_docs' reproducible subsampling."""
    df = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("event_id"), F.lit("42"))), 1, 8),
        16,
        10,
    ).cast("long") % 10
    return df.filter(bucket == 0).select("event_id", "user_id", "value")


@register(
    "stratified_sample",
    oracle="""
SELECT event_type, event_id, user_id, value, rnk FROM (
  SELECT event_type, event_id, user_id, value,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR) || ':7'), event_id
         ) AS rnk
  FROM events
) WHERE rnk <= 100
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly 100 rows per event_type,
    chosen by md5(event_id||seed) order — the engine-portable analog of
    per-stratum df.sample (O4 extension a training pipeline needs for
    class-balanced subsets). One window shuffle keyed by the stratum; at
    100 TB strata with billions of rows switch the full sort for an
    approximate hash-threshold pre-filter (keep rows whose hash < k·N/|S|,
    then exact-rank the survivors) — same output, bounded sort input."""
    df = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.concat_ws(":", F.col("event_id"), F.lit("7"))), "event_id"
    )
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select("event_type", "event_id", "user_id", "value", "rnk")
    )


@register(
    "salted_user_totals",
    oracle="""
SELECT user_id,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
  COUNT(*) AS n_rows,
  MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY user_id
""",
)
def salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-level salted aggregation (§4 hot-key pattern): salt →
    partial agg → merge. Decimal/integer partials make the result
    IDENTICAL to the direct groupBy, which is what the oracle states."""
    return salted_agg_sum_count(
        load_table(spark, sf_dir, "events"), "user_id", "value", n_salts=16
    )


@register(
    "data_quality_profile",
    oracle="""
SELECT 'event_id' AS col, COUNT(*) - COUNT(event_id) AS null_count,
       COUNT(DISTINCT event_id) AS distinct_count FROM events
UNION ALL
SELECT 'ts', COUNT(*) - COUNT(ts), COUNT(DISTINCT ts) FROM events
UNION ALL
SELECT 'user_id', COUNT(*) - COUNT(user_id), COUNT(DISTINCT user_id)
FROM events
UNION ALL
SELECT 'event_type', COUNT(*) - COUNT(event_type),
       COUNT(DISTINCT event_type) FROM events
UNION ALL
SELECT 'value', COUNT(*) - COUNT(value), COUNT(DISTINCT value) FROM events
UNION ALL
SELECT 'props', COUNT(*) - COUNT(props), COUNT(DISTINCT props) FROM events
""",
)
def data_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality profile of the event log: per column,
    null count and exact distinct cardinality — the validation gate a
    training pipeline runs before anything downstream trusts the data.
    One pass per column pair here for oracle exactness; the 100 TB form
    swaps COUNT(DISTINCT) for approx_count_distinct (declared sketch)
    and keeps the same shape."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    total = F.count(F.lit(1))
    parts = [
        ev.agg(
            F.lit(c).alias("col"),
            (total - F.count(F.col(c))).alias("null_count"),
            F.countDistinct(F.col(c)).alias("distinct_count"),
        )
        for c in cols
    ]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.union(pdf)
    return out


@register(
    "heavy_hitters_topk",
    oracle=__import__(
        "aml_feature_store_spark.operators.sketches", fromlist=["x"]
    ).heavy_hitters_sql("user_id", "events", top_n=15),
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-15 most frequent entities via a one-pass Misra-Gries
    candidate sketch + broadcast-verified exact counts
    (operators/sketches.py): the raw keys never shuffle — per-partition
    O(k) summaries collect once, candidates broadcast back for the exact
    pass. The reference's value_counts().head(n) semantic
    (feature_engineering/batch_features.py) at the shape that works on
    100 TB. Oracle = plain exact top-n (the sketch only prunes; with
    k=256 > |distinct| the candidate set is provably complete; the
    adversarial small-k bound is property-tested in test_sketches.py)."""
    from ..operators.sketches import heavy_hitters_exact_topk

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_exact_topk(ev, "user_id", top_n=15, k=256)


_TDIGEST_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       TRUE AS p50_within_bound,
       TRUE AS p95_within_bound,
       TRUE AS p99_within_bound
FROM events GROUP BY event_type
"""


def _tdigest_validated(spark, sf_dir: str, pre_rollup_col=None):
    """Shared body: t-digest quantiles -> rank-bound validation booleans
    (the quantiles_approx_by_event_type contract, ε=0.01 vs the sketch's
    measured ~1e-4 — tests/test_tdigest.py pins the tight bound)."""
    from ..operators.tdigest import group_quantiles

    df = load_table(spark, sf_dir, "events")
    if pre_rollup_col == "event_date":
        df = df.withColumn("event_date", F.to_date("ts"))
    approx = group_quantiles(
        df,
        ["event_type"],
        "value",
        {"_p50": 0.5, "_p95": 0.95, "_p99": 0.99},
        delta=500.0,
        pre_rollup_col=pre_rollup_col,
    ).drop("n")
    eps = 0.01
    joined = df.join(F.broadcast(approx), "event_type")
    agg = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            f
            for tag in ("p50", "p95", "p99")
            for f in (
                F.sum((F.col("value") <= F.col(f"_{tag}")).cast("long")).alias(
                    f"_le_{tag}"
                ),
                F.sum((F.col("value") < F.col(f"_{tag}")).cast("long")).alias(
                    f"_lt_{tag}"
                ),
            )
        ],
    )
    checks = [
        (
            (F.col(f"_le_{tag}") >= F.floor(F.lit(q - eps) * F.col("n")))
            & (F.col(f"_lt_{tag}") <= F.ceil(F.lit(q + eps) * F.col("n")))
        ).alias(f"{tag}_within_bound")
        for q, tag in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99"))
    ]
    return agg.select("event_type", "n", *checks)


@register("tdigest_quantiles_by_event_type", oracle=_TDIGEST_ORACLE)
def tdigest_quantiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest quantiles (operators/tdigest.py): map-side
    bounded-state centroid pass, shuffle only ~δ centroid rows per
    group, merge + interpolate per group. Unlike `percentile_approx`
    the sketch is a first-class VALUE (centroid rows) that can be
    persisted and re-aggregated — the 100 TB rollup shape. Validated by
    the rank-bound contract (same as quantiles_approx_by_event_type);
    numeric accuracy (~1e-4 rank error at δ=500) pinned in
    tests/test_tdigest.py. Reference: dashboard/app.py:366-367."""
    return _tdigest_validated(spark, sf_dir)


@register("tdigest_rollup_quantiles", oracle=_TDIGEST_ORACLE)
def tdigest_rollup_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ROLLUP: stage 1 digests per (event_type, day) — the shape
    a nightly job would persist — then per-type quantiles computed by
    merging the per-day centroid rows, never rescanning raw values.
    Proves the re-aggregation path percentile_approx cannot express in
    SQL; validated by the same rank-bound contract."""
    return _tdigest_validated(spark, sf_dir, pre_rollup_col="event_date")


@register(
    "countmin_frequency_validation",
    oracle="""
SELECT COUNT(DISTINCT user_id) AS n_users,
       0 AS n_underestimates,
       0 AS n_over_bound,
       TRUE AS rollup_matches
FROM events
""",
)
def countmin_frequency_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point-frequency sketch (operators/sketches.py): d=4
    hash rows × w=8192 counters built in one scan with map-side combine
    (each event explodes to d probes that pre-aggregate to ≤ d·w rows
    per partition). Pins the CM contract deterministically: estimates
    never undershoot (structural), never overshoot exact + 8N/w
    (measured 0 overshoot at every test SF — the bound has ∞ margin
    here and ~4σ margin in the adversarial regime), and a per-day
    sketch SUM-merged equals the direct build counter-for-counter
    (integer addition is associative — the persisted-rollup soundness
    property, exact, not approximate)."""
    from ..operators.sketches import countmin_lookup, countmin_table

    d, w = 4, 8192
    df = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    cm = countmin_table(df, "user_id", d, w)
    per_day = countmin_table(df, "user_id", d, w, extra_group_cols=["event_date"])
    rolled = per_day.groupBy("cm_row", "cm_bucket").agg(F.sum("cnt").alias("cnt"))
    mismatches = (
        cm.withColumnRenamed("cnt", "c_direct")
        .join(
            rolled.withColumnRenamed("cnt", "c_rolled"),
            ["cm_row", "cm_bucket"],
            "full_outer",
        )
        .agg(
            F.sum(
                (
                    F.col("c_direct").isNull()
                    | F.col("c_rolled").isNull()
                    | (F.col("c_direct") != F.col("c_rolled"))
                ).cast("long")
            ).alias("_n_mismatch")
        )
    )
    est = countmin_lookup(cm, df, "user_id", d, w)
    exact = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("_exact"))
    total = df.count()
    bound = max(1, (8 * total) // w)
    checks = est.join(exact, "user_id").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("cm_estimate") < F.col("_exact")).cast("long")).alias(
            "n_underestimates"
        ),
        F.sum(
            (F.col("cm_estimate") > F.col("_exact") + F.lit(bound)).cast("long")
        ).alias("n_over_bound"),
    )
    return checks.crossJoin(
        F.broadcast(mismatches.select((F.col("_n_mismatch") == 0).alias("rollup_matches")))
    ).select("n_users", "n_underestimates", "n_over_bound", "rollup_matches")


@register(
    "bloom_membership_validation",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
         AS n_members,
       TRUE AS zero_false_negatives,
       TRUE AS fp_within_bound,
       TRUE AS rollup_matches
FROM events
""",
)
def bloom_membership_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter (operators/sketches.py:
    bloom_bits/bloom_probe) — the screen-before-exact-join shape a
    100 TB ingest uses to ask "was this id already ingested?" without
    touching the full corpus. Members are purchase event_ids; every
    event_id is probed. Deterministic validation contract (same style
    as the CM/HLL rows): (1) zero false negatives — structural, every
    member must probe positive; (2) false positives among nonmembers
    within expected-rate + 5 sigma + 1 (p = (1-e^{-kn/m})^k ~ 4.5e-4 at
    16 bits/member, k=11 — the boolean is a pure function of the data,
    so it is a stable relational output, not a flaky statistic); and
    (3) a per-day bit table OR-merged (DISTINCT union) is set-identical
    to the direct build — the persisted-rollup soundness property,
    exact. The bits table (<= min(m, k*n) rows) is broadcast to the
    probe join; at scales where m outgrows the broadcast threshold the
    same plan degrades to a shuffled equi-join on bit_pos."""
    import math

    from ..operators.sketches import bloom_bits, bloom_probe

    df = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    members = df.where(F.col("event_type") == "purchase")
    n = members.count()  # bounded driver scalar (sizes m), same as CM total
    k = 11
    m = max(1024, 16 * n)
    bits = bloom_bits(members, "event_id", m, k)
    per_day = bloom_bits(
        members, "event_id", m, k, extra_group_cols=["event_date"]
    )
    merged = per_day.select("bit_pos").distinct()
    mismatch = (
        bits.withColumn("_d", F.lit(1))
        .join(merged.withColumn("_m", F.lit(1)), "bit_pos", "full_outer")
        .agg(
            F.sum(
                (F.col("_d").isNull() | F.col("_m").isNull()).cast("long")
            ).alias("_n_mismatch")
        )
    )
    probed = bloom_probe(bits, df, "event_id", m, k)
    flags = probed.join(df.select("event_id", "event_type"), "event_id")
    p = (1.0 - math.exp(-k * n / m)) ** k
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_members"
        ),
        F.sum(
            ((F.col("event_type") == "purchase") & ~F.col("bloom_positive")).cast(
                "long"
            )
        ).alias("_fn"),
        F.sum(
            ((F.col("event_type") != "purchase") & F.col("bloom_positive")).cast(
                "long"
            )
        ).alias("_fp"),
        F.sum((F.col("event_type") != "purchase").cast("long")).alias("_nn"),
    )
    bound = (
        F.lit(p) * F.col("_nn")
        + F.lit(5.0) * F.sqrt(F.lit(p) * F.col("_nn"))
        + F.lit(1.0)
    )
    return agg.crossJoin(F.broadcast(mismatch)).select(
        "n_probes",
        "n_members",
        (F.col("_fn") == F.lit(0)).alias("zero_false_negatives"),
        (F.col("_fp") <= bound).alias("fp_within_bound"),
        (F.col("_n_mismatch") == F.lit(0)).alias("rollup_matches"),
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
       MAX(value) AS max_value,
       MIN(value) AS min_value
FROM events
GROUP BY user_id
""",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the nightly 100 TB shape:
    yesterday's per-user aggregate STATE merged with today's partition
    DELTA instead of rescanning the full history. The engine computes
    state (all days but the last) and delta (the last day) separately,
    then MERGEs them with a full-outer join + mergeable combiners
    (count/decimal-sum add, max/min greatest/least, coalesce for
    one-sided users). The DuckDB oracle computes the SAME result
    directly over the full table — a cross-derivation check: the merge
    path and the recompute path must agree bit-exactly (decimal sums
    make the addition associative, so they do). At scale the state side
    is a compact persisted table and only the delta partition is
    scanned; the merge is one equi-join on the aggregation key."""
    df = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    max_date = df.agg(F.max("event_date")).first()[0]  # bounded scalar
    DEC = "decimal(25,2)"

    def _agg(part):
        return part.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("s"),
            F.max("value").alias("mx"),
            F.min("value").alias("mn"),
        )

    state = _agg(df.where(F.col("event_date") < F.lit(max_date)))
    delta = _agg(df.where(F.col("event_date") == F.lit(max_date)))
    s = state.select(
        "user_id",
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("mx").alias("mx_a"),
        F.col("mn").alias("mn_a"),
    )
    d = delta.select(
        "user_id",
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("mx").alias("mx_b"),
        F.col("mn").alias("mn_b"),
    )
    merged = s.join(d, "user_id", "full_outer")
    zero = F.lit(0).cast("long")
    return merged.select(
        "user_id",
        (F.coalesce("n_a", zero) + F.coalesce("n_b", zero)).alias("n_events"),
        (
            F.coalesce(F.col("s_a"), F.lit(0).cast(DEC))
            + F.coalesce(F.col("s_b"), F.lit(0).cast(DEC))
        )
        .cast("double")
        .alias("sum_value"),
        F.greatest(
            F.coalesce("mx_a", "mx_b"), F.coalesce("mx_b", "mx_a")
        ).alias("max_value"),
        F.least(
            F.coalesce("mn_a", "mn_b"), F.coalesce("mn_b", "mn_a")
        ).alias("min_value"),
    )


@register(
    "skew_split_join_revenue",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(25,2))) AS DOUBLE) AS revenue
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def skew_split_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join (operators/skew.py:skew_split_join): the generator
    plants hot users (~25% of events on ~100 keys), the classic shape
    where one shuffle partition of a plain sort-merge join holds a
    quarter of the fact table. The engine routes the top-10 hottest
    keys through a broadcast of the dim's hot slice (their rows never
    shuffle) and the cold remainder through the regular join, then
    unions — the explicit form of AQE's skew-join split. The DuckDB
    oracle runs the DIRECT join: split path and direct path must agree
    bit-exactly (cross-derivation check, decimal sums)."""
    from ..operators.skew import skew_split_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    hot = [
        r["user_id"]
        for r in ev.groupBy("user_id")
        .count()
        .orderBy(F.col("count").desc(), "user_id")
        .limit(10)
        .collect()
    ]  # bounded: K=10 driver scalars
    joined = skew_split_join(ev, cust, "user_id", "c_custkey", hot)
    return joined.groupBy(
        F.col("c_mktsegment").alias("mktsegment")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,2)"))
        .cast("double")
        .alias("revenue"),
    )
