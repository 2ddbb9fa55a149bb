"""Registered queries: windowed statistical aggregates that need per-frame
ranking (A9/A10 in their notebook per-window form), streaming graph edges
(T4), and the approx-distinct scale variant (A6)."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import register
from ..schemas import EVENT_PROPS, EVENTS_RAW
from ..sources import load_table

DEC = "decimal(25,2)"


@register(
    "windowed_gini_24h",
    oracle="""
WITH pairs AS (
  SELECT e1.event_id, e1.user_id, e2.value AS v2, e2.event_id AS eid2
  FROM events e1 JOIN events e2
    ON e1.user_id = e2.user_id
   AND epoch_ms(e2.ts) BETWEEN epoch_ms(e1.ts) - 86400000 AND epoch_ms(e1.ts)
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY v2, eid2) AS rn
  FROM pairs
), agg AS (
  SELECT event_id, user_id, COUNT(*) AS n,
         SUM(CAST(v2 AS DECIMAL(25,2))) AS s,
         SUM(rn * CAST(v2 AS DECIMAL(25,2))) AS s1
  FROM ranked GROUP BY event_id, user_id
)
SELECT event_id, user_id, n AS txn_count_24h,
  CASE WHEN CAST(s AS DOUBLE) != 0.0 THEN
    (2.0 * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
      - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
  ELSE 0.0 END AS gini_amount_24h
FROM agg
""",
)
def windowed_gini_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini of amounts within each event's trailing 24h window — the
    notebook's per-window concentration feature (nb:cell6 l.68-73) in its
    faithful windowed form: frame materialized by an interval self-join on
    the entity key, ranked per frame, closed-form Gini per event.

    Scale: O(Σ frame sizes) pair rows — bounded by (per-key daily rate)²,
    not table size; one shuffle on the entity key + one on event_id.
    """
    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    e1 = ev.select("event_id", "user_id", ms.alias("_ms"))
    e2 = ev.select(
        F.col("user_id").alias("_u2"),
        ms.alias("_ms2"),
        F.col("value").alias("v2"),
        F.col("event_id").alias("eid2"),
    )
    pairs = e1.join(
        e2,
        (F.col("user_id") == F.col("_u2"))
        & (F.col("_ms2") >= F.col("_ms") - 86400000)
        & (F.col("_ms2") <= F.col("_ms")),
    )
    w = Window.partitionBy("event_id").orderBy("v2", "eid2")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("v2").cast(DEC)).alias("_s"),
        F.sum(F.col("rn") * F.col("v2").cast(DEC)).alias("_s1"),
    )
    n = F.col("_n").cast("double")
    s, s1 = F.col("_s").cast("double"), F.col("_s1").cast("double")
    return agg.select(
        "event_id",
        "user_id",
        F.col("_n").alias("txn_count_24h"),
        F.when(s != 0.0, (F.lit(2.0) * s1) / (n * s) - (n + F.lit(1.0)) / n)
        .otherwise(F.lit(0.0))
        .alias("gini_amount_24h"),
    )


@register(
    "windowed_hhi_24h",
    oracle="""
WITH pairs AS (
  SELECT e1.event_id, e1.user_id, e2.event_type AS cat
  FROM events e1 JOIN events e2
    ON e1.user_id = e2.user_id
   AND epoch_ms(e2.ts) BETWEEN epoch_ms(e1.ts) - 86400000 AND epoch_ms(e1.ts)
), cnt AS (
  SELECT event_id, user_id, cat, COUNT(*) AS c
  FROM pairs GROUP BY event_id, user_id, cat
), agg AS (
  SELECT event_id, user_id, SUM(c * c) AS sq, SUM(c) AS tot
  FROM cnt GROUP BY event_id, user_id
)
SELECT event_id, user_id, CAST(tot AS BIGINT) AS txn_count_24h,
       CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
         AS hhi_event_type_24h
FROM agg
""",
)
def windowed_hhi_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-concentration HHI within each event's trailing 24h window
    (merchant_concentration_hhi per window, nb:cell6 l.78-81): interval
    self-join → two-level count → exact integer-sum HHI per event."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    e1 = ev.select("event_id", "user_id", ms.alias("_ms"))
    e2 = ev.select(
        F.col("user_id").alias("_u2"),
        ms.alias("_ms2"),
        F.col("event_type").alias("cat"),
    )
    pairs = e1.join(
        e2,
        (F.col("user_id") == F.col("_u2"))
        & (F.col("_ms2") >= F.col("_ms") - 86400000)
        & (F.col("_ms2") <= F.col("_ms")),
    )
    cnt = pairs.groupBy("event_id", "user_id", "cat").agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = cnt.groupBy("event_id", "user_id").agg(
        F.sum(F.col("_c") * F.col("_c")).alias("_sq"),
        F.sum("_c").alias("_tot"),
    )
    tot = F.col("_tot").cast("double")
    return agg.select(
        "event_id",
        "user_id",
        F.col("_tot").alias("txn_count_24h"),
        (F.col("_sq").cast("double") / (tot * tot)).alias("hhi_event_type_24h"),
    )


@register(
    "streaming_graph_edges",
    oracle=r"""
SELECT user_id AS src,
       CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS dst,
       COUNT(*) AS n_txn,
       CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS weight
FROM events
GROUP BY user_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
""",
)
def streaming_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming edge-weight state (T4): groupBy(src, dst) aggregation over
    the event stream in COMPLETE mode — the reference's unbounded MapState
    edge table (real_time_processor.py:270-298) as a streaming aggregation.
    Complete-mode output over a bounded stream ≡ the batch groupBy, so the
    oracle applies exactly."""
    src = tempfile.mkdtemp(prefix="stream_src_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    raw = spark.readStream.schema(EVENTS_RAW).parquet(src)
    edges = (
        raw.withColumn("dst", F.from_json("props", EVENT_PROPS)["k"])
        .groupBy(F.col("user_id").alias("src"), "dst")
        .agg(
            F.count(F.lit(1)).alias("n_txn"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("weight"),
        )
    )
    name = f"edges_q_{uuid.uuid4().hex[:8]}"
    q = (
        edges.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register("unique_users_approx_by_type", oracle=None)
def unique_users_approx_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct users per event type (A6 scale variant,
    2% relative error declared). Rows-only: sketch estimates are
    engine-specific; the exact twin is oracle-checked elsewhere. The HLL
    merge is commutative, so results are stable across partitionings."""
    df = load_table(spark, sf_dir, "events")
    return df.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_unique_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
