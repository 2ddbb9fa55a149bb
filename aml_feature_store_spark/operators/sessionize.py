"""Sessionization (SURVEY §2.9 T10 / guide 'common OLAP patterns').

Batch formulation: lag(ts) per entity → new-session flag when the gap
exceeds the timeout → session id = cumulative sum of flags → per-session
aggregates. The reference's burst *detection* (gap < 300 s ratio,
advanced_features.py:151-153) is the same primitive with an inverted
threshold; streaming twin is ``session_window(ts, gap)``.
One shuffle on the entity key; both windows share the same sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEC = "decimal(25,2)"


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    amount_col: str = "value",
    gap_s: int = 1800,
) -> DataFrame:
    """Per-session aggregates: (entity, session_id, start/end ms, n_events,
    sum_value, duration_s)."""
    ms = F.unix_millis(F.col(ts_col))
    w = Window.partitionBy(entity_col).orderBy(ms, F.col(tiebreak_col))
    flagged = df.withColumn("_ms", ms).withColumn(
        "_new",
        F.when(
            (F.col("_ms") - F.lag("_ms").over(w)) > gap_s * 1000, 1
        ).otherwise(0),
    )
    wcum = Window.partitionBy(entity_col).orderBy("_ms", tiebreak_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.withColumn("session_id", F.sum("_new").over(wcum))
    return sess.groupBy(entity_col, "session_id").agg(
        F.min("_ms").alias("session_start_ms"),
        F.max("_ms").alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(amount_col).cast(DEC)).cast("double").alias("sum_value"),
        ((F.max("_ms") - F.min("_ms")).cast("double") / 1000.0).alias("duration_s"),
    )


def sessionize_sql(
    table: str = "events",
    entity: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    amount: str = "value",
    gap_s: int = 1800,
) -> str:
    return f"""
WITH flagged AS (
  SELECT {entity}, {tiebreak}, epoch_ms({ts}) AS ms, {amount},
    CASE WHEN epoch_ms({ts}) - LAG(epoch_ms({ts})) OVER
           (PARTITION BY {entity} ORDER BY epoch_ms({ts}), {tiebreak})
         > {gap_s * 1000} THEN 1 ELSE 0 END AS newf
  FROM {table}
), sess AS (
  SELECT *, SUM(newf) OVER (PARTITION BY {entity} ORDER BY ms, {tiebreak}
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_id
  FROM flagged
)
SELECT {entity}, CAST(session_id AS BIGINT) AS session_id,
  MIN(ms) AS session_start_ms, MAX(ms) AS session_end_ms,
  COUNT(*) AS n_events,
  CAST(SUM(CAST({amount} AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
  CAST(MAX(ms) - MIN(ms) AS DOUBLE) / 1000.0 AS duration_s
FROM sess GROUP BY {entity}, session_id
"""
