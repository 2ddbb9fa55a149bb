"""Registered queries: relational/OLAP surface — grouped aggregation, star
joins, top-k per group, tumbling rollups, quantiles (SURVEY §2.4 A21-A25,
§2.6 O1-O3, §2.5 W3). These run on the TPC-H-ish tables and double as the
bench headliners (BASELINE.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import register
from ..sources import load_table

DEC = "decimal(25,2)"


@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS avg_qty,
  CAST(SUM(CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-aggregate groupBy with
    predicate pushed to the parquet scan (A1-A5 in grouped form).

    Scale: partial+final hash aggregation (map-side combine) — the scan
    filter appears in PushedFilters; 2 grouping keys → tiny shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,4)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(38,6)")
    n = F.count(F.lit(1))
    return f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias(
            "sum_base_price"
        ),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / n.cast("double")).alias(
            "avg_qty"
        ),
        (F.sum(F.col("l_discount").cast(DEC)).cast("double") / n.cast("double")).alias(
            "avg_disc"
        ),
        n.alias("count_order"),
    )


@register(
    "regional_revenue",
    oracle="""
SELECT r.r_name, n.n_name, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup: orders ⋈ customer ⋈ nation ⋈ region → revenue per
    (region, nation). Dimensions are explicitly broadcast (J1/J3 pattern) —
    the fact table never shuffles for the joins, only for the final 2-key
    aggregation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
    )


@register(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per customer (W3/O3 per-group top-k):
    row_number + filter → Catalyst window-group-limit pushdown (no full
    sort of the fact table). Reference: api/main.py:216-219 top-3
    contributions; dashboard/app.py:330-332."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "time_bucket_rollup",
    oracle="""
SELECT user_id, epoch_ms(ts) // 600000 AS bucket_10m, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS avg_value
FROM events GROUP BY user_id, epoch_ms(ts) // 600000
""",
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute rollup per user (A21/T6): floor-bucket on epoch-ms
    ≡ groupBy(window(ts, '10 minutes')) — emitted as the bucket ordinal for
    oracle parity. Reference: dashboard/app.py:268-275."""
    df = load_table(spark, sf_dir, "events")
    bucket = F.expr("unix_millis(ts) div 600000")
    n = F.count(F.lit(1))
    s = F.sum(F.col("value").cast(DEC)).cast("double")
    return df.groupBy("user_id", bucket.alias("bucket_10m")).agg(
        n.alias("n_events"),
        s.alias("sum_value"),
        (s / n.cast("double")).alias("avg_value"),
    )


@register(
    "quantiles_by_event_type",
    oracle="""
SELECT event_type, COUNT(*) AS n,
  ROUND(quantile_cont(value, 0.5), 6) AS p50_value,
  ROUND(quantile_cont(value, 0.95), 6) AS p95_value,
  ROUND(quantile_cont(value, 0.99), 6) AS p99_value
FROM events GROUP BY event_type
""",
)
def quantiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p95/p99 of amount per event type (A22).

    Engine uses `percentile` (exact, Spark) ≡ DuckDB quantile_cont; at
    100 TB switch to percentile_approx (declared tolerance) — reference:
    dashboard/app.py:366-367 latency quantiles."""
    df = load_table(spark, sf_dir, "events")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_value"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_value"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99_value"),
    )


_Q_APPROX_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       TRUE AS p50_within_bound,
       TRUE AS p95_within_bound,
       TRUE AS p99_within_bound
FROM events GROUP BY event_type
"""


@register("quantiles_approx_by_event_type", oracle=_Q_APPROX_ORACLE)
def quantiles_approx_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of `quantiles_by_event_type`: percentile_approx
    (Greenwald-Khanna sketch, accuracy 10000 → max rank error ε=1e-4) —
    mergeable partial sketches, no global sort, bounded memory per
    partition.

    Oracle-checked via the rank-error contract (r6, VERDICT r5 #7): the
    raw sketch output is implementation-defined, so the registered output
    is the VALIDATION of each approx quantile against exact value ranks —
    per event type, #{value ≤ approx} must reach floor((q−ε)·n) and
    #{value < approx} must not exceed ceil((q+ε)·n). The oracle asserts
    those booleans are all TRUE; any sketch/plumbing regression flips a
    boolean and fails the hash. tests/test_stats.py keeps the numeric
    rank-error pin (A22 scale path)."""
    df = load_table(spark, sf_dir, "events")
    approx = df.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("_p50"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("_p95"),
        F.percentile_approx("value", F.lit(0.99), F.lit(10000)).alias("_p99"),
    )
    eps = 1e-4
    joined = df.join(F.broadcast(approx), "event_type")
    agg = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            f
            for q, tag in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99"))
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


@register(
    "mktsegment_acctbal_summary",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS total_acctbal,
  MAX(c_acctbal) AS max_acctbal, MIN(c_acctbal) AS min_acctbal
FROM customer GROUP BY c_mktsegment
""",
)
def mktsegment_acctbal_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style summary per segment (A23/A25 value_counts+stats)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
        F.min("c_acctbal").alias("min_acctbal"),
    )


@register(
    "revenue_cube_by_type_dow",
    oracle="""
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(isodow(ts) - 1, -1) AS weekday,
       GROUPING(event_type, isodow(ts) - 1) AS gid,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE(event_type, isodow(ts) - 1)
""",
)
def revenue_cube_by_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE over (event_type, weekday) with grouping ids — all four
    aggregation granularities (detail, per-type, per-weekday, grand
    total) in ONE pass: Spark's Expand operator fans each row into its
    grouping sets before a single hash aggregation, so the cube costs
    one shuffle, not four scans (A21/A25 family; the dashboard rollups
    of dashboard/app.py:340-420 generalized). NULL group keys are
    coalesced to sentinels on both engines so the compare is total."""
    df = load_table(spark, sf_dir, "events")
    wd = F.weekday("ts").cast("long")
    return (
        df.cube(F.col("event_type"), wd.alias("weekday"))
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("weekday", F.lit(-1)).alias("weekday"),
            "gid",
            "n_events",
            "sum_value",
        )
    )


@register(
    "shipping_priority_q3",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
       epoch_ms(o.o_orderdate) AS orderdate_ms,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
""",
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): customer ⨝ orders ⨝ lineitem
    with selective filters on all three tables, revenue per open order,
    global top-10. The segment filter prunes customers BEFORE the join
    (broadcast build side), date predicates push to both fact scans, and
    the top-10 is a TakeOrderedAndProject. Decimal-exact revenue."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(
            o, li["l_orderkey"] == o["o_orderkey"]
        )
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.unix_millis("o_orderdate").alias("orderdate_ms"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(25,4)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate_ms", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@register(
    "promo_revenue_q14",
    oracle="""
SELECT date_trunc('month', l.l_shipdate) AS ship_month,
       round(100.0 * round(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,4)) ELSE CAST(0 AS DECIMAL(25,4))
               END) AS DOUBLE), 4)
             / round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(25,4))) AS DOUBLE), 4), 6) + 0.0
         AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY date_trunc('month', l.l_shipdate)
""",
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): per ship month, the share of
    revenue from PROMO parts — conditional decimal-exact sums over a
    fact ⨝ broadcast-dimension join. The part table is the classic
    broadcast side; the ratio divides two decimal sums rounded to 4 dp
    so both engines divide bit-identical operands."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return (
        joined.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(25,4)")
                    )
                ).cast("double"),
                4,
            ).alias("_promo"),
            F.round(F.sum(rev).cast("double"), 4).alias("_total"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "ship_month",
            (
                F.round(F.lit(100.0) * F.col("_promo") / F.col("_total"), 6)
                + F.lit(0.0)
            ).alias("promo_revenue_pct"),
            "n_items",
        )
    )


@register(
    "order_priority_check_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def order_priority_check_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape adapted to the generated schema (no l_commitdate
    column): orders in a one-year range having at least one lineitem
    shipped after the order date, counted per priority. Exercises the
    correlated-EXISTS plan — Spark LEFT SEMI join with an equi key plus
    a non-equi residual condition; the date filter prunes the orders
    scan before the shuffle (O1/J-family breadth)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    sel = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "supplier_part_counts_q16",
    oracle="""
SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 15
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_size
""",
)
def supplier_part_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted to the generated schema (lineitem is the
    part-supplier link, negative-balance suppliers play the complaints
    exclusion): distinct suppliers per (brand, size). Exercises the
    NOT-IN anti-join (broadcast — the excluded set is tiny) feeding a
    distinct-count aggregation; part is broadcast onto the lineitem
    scan so the only shuffle is the final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 15)
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    joined = (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    )
    return joined.groupBy("p_brand", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "large_volume_customer_q18",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(25,2))) AS qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(25,2))) > 250
)
SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       epoch_ms(o.o_orderdate) AS orderdate_ms,
       o.o_totalprice AS totalprice,
       CAST(b.qty AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN big b ON b.l_orderkey = o.o_orderkey
ORDER BY totalprice DESC, orderkey
LIMIT 100
""",
)
def large_volume_customer_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customer): orders whose total
    lineitem quantity exceeds 250 (~top 1%), joined back to customer,
    top-100 by order value. Exercises the HAVING-subquery shape; unlike
    the textbook plan the big-order aggregate is computed ONCE and its
    sum reused (no second lineitem scan), the tiny qualifying set is
    broadcast into the orders join, and the final cut is a
    TakeOrderedAndProject with a unique-key tiebreak. Decimal-exact
    quantity sums (house float rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,2)")).alias("qty"))
        .where(F.col("qty") > 250)
    )
    sel = o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
    return (
        c.join(F.broadcast(sel), c["c_custkey"] == sel["o_custkey"])
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.unix_millis("o_orderdate").alias("orderdate_ms"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "orderkey")
        .limit(100)
    )


@register(
    "local_supplier_volume_q5",
    oracle="""
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(25,4))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the six-way join —
    region → nation → supplier/customer → orders → lineitem — with the
    same-nation residual on the supplier join, revenue per nation in one
    region-year. The deepest multi-way join in the catalog: dimensions
    (region, nation, supplier, customer) all broadcast, so the two fact
    tables join and aggregate with a single shuffle each and Catalyst is
    free to reorder the dimension builds; the region/date filters prune
    before any join. Decimal-exact revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(25,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "suppliers_kept_waiting_q21",
    oracle="""
SELECT s.s_name AS s_name, COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1
    FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def suppliers_kept_waiting_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) adapted to the
    generated schema: no l_commitdate/l_receiptdate, so "late" =
    l_shipdate more than 60 days after o_orderdate. For finished orders
    ('F') in region EUROPE: count, per supplier, late lineitems in
    multi-supplier orders where that supplier was the ONLY late one —
    the classic EXISTS + NOT EXISTS double self-join on lineitem, the
    skew/semi-join stressor. Spark shape: the late set is computed once;
    both the EXISTS (left_semi) and NOT-EXISTS (left_anti) self-joins
    shuffle on l_orderkey — the same key as the build — so AQE reuses
    one exchange layout, and the supplier/nation/region dimension stack
    is broadcast."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    waiting = (
        late.join(
            other,
            (late["l_orderkey"] == other["_ok"])
            & (late["l_suppkey"] != other["_sk"]),
            "left_semi",
        )
        .join(
            other_late,
            (late["l_orderkey"] == other_late["_ok"])
            & (late["l_suppkey"] != other_late["_sk"]),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name")
    )
    return (
        waiting.join(F.broadcast(sup), waiting["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "min_balance_supplier_q2",
    oracle="""
WITH eu AS MATERIALIZED (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
links AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eul AS MATERIALIZED (
  SELECT l.l_partkey, e.s_suppkey, e.s_name, e.s_acctbal, e.n_name
  FROM links l JOIN eu e ON l.l_suppkey = e.s_suppkey
),
mn AS (SELECT l_partkey, MIN(s_acctbal) AS min_bal FROM eul GROUP BY l_partkey)
SELECT DISTINCT e.s_acctbal AS acctbal, e.s_name AS s_name,
       e.n_name AS nation, p.p_partkey AS partkey, p.p_name AS p_name
FROM eul e
JOIN mn m ON m.l_partkey = e.l_partkey AND e.s_acctbal = m.min_bal
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_size = 15
ORDER BY acctbal DESC, nation, s_name, partkey
LIMIT 100
""",
)
def min_balance_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier) adapted to the generated
    schema: no partsupp/ps_supplycost, so the part-supplier relation is
    the DISTINCT (l_partkey, l_suppkey) projection of lineitem and the
    cost criterion is the supplier's account balance — for each size-15
    part, the EUROPE supplier(s) with the minimum balance among its
    EUROPE suppliers. The correlated scalar-MIN subquery is decorrelated
    into a per-part aggregate + equality join (the standard Catalyst
    rewrite, here written explicitly): one shuffle for the distinct
    link projection, per-part min and the equality join both broadcast,
    final cut a TakeOrderedAndProject."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    links = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    eul = links.join(F.broadcast(eu), links["l_suppkey"] == eu["s_suppkey"])
    mn = eul.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        eul.join(
            F.broadcast(mn.withColumnRenamed("l_partkey", "_pk")),
            (eul["l_partkey"] == F.col("_pk"))
            & (eul["s_acctbal"] == F.col("min_bal")),
        )
        .join(F.broadcast(p), eul["l_partkey"] == p["p_partkey"])
        .select(
            F.col("s_acctbal").alias("acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            "p_name",
        )
        .distinct()
        .orderBy(F.col("acctbal").desc(), "nation", "s_name", "partkey")
        .limit(100)
    )


@register(
    "dominant_part_suppliers_q20",
    oracle="""
WITH yr AS MATERIALIZED (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(25,2)) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
),
tot AS (SELECT l_partkey, SUM(q) AS t FROM yr GROUP BY l_partkey),
per AS (SELECT l_partkey, l_suppkey, SUM(q) AS q FROM yr
        GROUP BY l_partkey, l_suppkey)
SELECT DISTINCT s.s_name AS s_name, n.n_name AS nation
FROM per
JOIN tot USING (l_partkey)
JOIN part p ON p.p_partkey = per.l_partkey AND p.p_name LIKE 'red%'
JOIN supplier s ON s.s_suppkey = per.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE 2 * per.q > tot.t
ORDER BY s_name, nation
""",
)
def dominant_part_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion) adapted to the
    generated schema: no partsupp/ps_availqty, so the correlated
    "availqty > half the shipped volume" predicate becomes "this
    supplier shipped more than half of the part's total 1996 volume" —
    suppliers dominating any red part's supply. The correlated scalar
    aggregate decorrelates into two partial aggregates over ONE
    year-pruned scan (per-(part,supplier) and per-part) joined on
    l_partkey; the comparison is decimal-exact as 2q > t (no 0.5*
    double rounding); part/supplier/nation dims broadcast."""
    yr = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("l_quantity").cast("decimal(25,2)").alias("q"),
        )
    )
    per = yr.groupBy("l_partkey", "l_suppkey").agg(F.sum("q").alias("q"))
    tot = yr.groupBy("l_partkey").agg(F.sum("q").alias("t"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        per.join(tot, "l_partkey")
        .filter(F.lit(2) * F.col("q") > F.col("t"))
        .join(F.broadcast(p), per["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), per["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("s_name", "nation")
    )


@register(
    "volume_shipping_q7",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(25,4))) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
""",
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two trading nations):
    revenue per (supplier nation, customer nation, ship year) for the
    symmetric nation pair — the canonical disjunctive cross-dimension
    residual ((A,B) OR (B,A)) that no single equi-key can carry. Scale
    shape: both nation dims and the filtered supplier/customer dims
    broadcast, so the only shuffles are the lineitem⨝orders fact join
    and the final partial-aggregated groupBy; the two-year l_shipdate
    range prunes the fact scan before the join, and the OR residual
    evaluates post-join on broadcast-delivered columns (no nested-loop
    fallback). Decimal-exact revenue."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(25,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "returned_item_reporting_q10",
    oracle="""
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
       c.c_acctbal AS c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_item_reporting_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned item reporting): the 20 customers who
    lost the most revenue to returns in one quarter — join-agg over a
    quarter-pruned orders scan and the returnflag-filtered lineitem,
    grouped on the full customer identity, then a GLOBAL top-20. Scale
    shape: customer + nation broadcast, orders carries its date filter
    into the scan and lineitem its returnflag filter; one shuffle for
    the fact join, one partial-aggregated groupBy, and the final top-20
    is TakeOrderedAndProject (no global sort materialization).
    Deterministic under revenue ties via the c_custkey tiebreak;
    decimal-exact revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(25,4)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "disjunctive_revenue_q19",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(25,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate)
    adapted to the generated schema (no p_container/l_shipmode: the
    brand × size × quantity OR-of-ANDs keeps the shape): total revenue
    from lineitems matching any of three brand/size/quantity windows.
    Scale shape: the part side prunes to the three brands BEFORE the
    broadcast (derived single-column filters pushed into both scans —
    the union quantity envelope 1..40 reaches the lineitem scan), the
    join stays a broadcast equi-join on p_partkey, and the OR-of-ANDs
    evaluates post-join as a codegen'd residual — the pattern that keeps
    disjunctions out of nested-loop joins at 100 TB. Decimal-exact
    single-row revenue."""
    brands = ("Brand#1", "Brand#2", "Brand#3")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 40)
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*brands) & F.col("p_size").between(1, 30)
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(25,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )
