"""Registered queries: statistical/behavioral aggregates (SURVEY §2.4 A9-A20)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..operators import stats
from ..sources import load_table


@register("gini_per_user", oracle=stats.gini_oracle())
def gini_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of amounts per user (A9)."""
    return stats.gini_per_entity(load_table(spark, sf_dir, "events"))


@register("hhi_per_user", oracle=stats.hhi_oracle())
def hhi_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type concentration (HHI) per user (A10/A20)."""
    return stats.hhi_per_entity(load_table(spark, sf_dir, "events"))


@register("hour_entropy_per_user", oracle=stats.entropy_oracle())
def hour_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of hour-of-day distribution + peak-hour ratio (A11/A12)."""
    return stats.entropy_per_entity(load_table(spark, sf_dir, "events"))


@register(
    "dow_entropy_per_user",
    oracle=stats.entropy_oracle(
        bucket_sql="isodow(ts) - 1", bucket_name="weekday", out_col="dow_entropy"
    ),
)
def dow_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy of day-of-week distribution (A11; weekday 0=Mon..6=Sun both
    engines — Spark weekday() ≡ DuckDB isodow()-1, the F2 trap)."""
    return stats.entropy_per_entity(
        load_table(spark, sf_dir, "events"),
        bucket_expr=F.weekday("ts"),
        bucket_name="weekday",
        out_col="dow_entropy",
    )


@register("interarrival_stats_per_user", oracle=stats.interarrival_oracle())
def interarrival_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap mean/std/min/max, regularity, burst ratio (A18/W2)."""
    return stats.interarrival_stats(load_table(spark, sf_dir, "events"))


@register("amount_trend_per_user", oracle=stats.trend_oracle())
def amount_trend_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression slope/strength of amount vs event index (A17)."""
    return stats.trend_per_entity(load_table(spark, sf_dir, "events"))


@register("population_zscore_per_user", oracle=stats.population_zscore_oracle())
def population_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user mean amount z-scored + percentile vs population (A15/A16/J4)."""
    return stats.population_zscore(load_table(spark, sf_dir, "events"))


@register("moments_per_user", oracle=stats.moments_oracle())
def moments_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coefficient of variation, skewness, Fisher kurtosis per user (A13/A14)."""
    return stats.moments_per_entity(load_table(spark, sf_dir, "events"))


@register(
    "daily_counts_per_user",
    oracle="""
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
""",
)
def daily_counts_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per (user, day) — frequency base for temporal features (A19)."""
    df = load_table(spark, sf_dir, "events")
    return df.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
    )


@register(
    "robust_zscore_outliers",
    oracle="""
WITH med AS (
  SELECT user_id, round(quantile_cont(value, 0.5), 9) AS med
  FROM events GROUP BY user_id
), dev AS (
  SELECT e.user_id, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (user_id)
), mad AS (
  SELECT user_id, round(quantile_cont(adev, 0.5), 9) AS mad
  FROM dev GROUP BY user_id
)
SELECT d.user_id, COUNT(*) AS n,
       round(any_value(d.med), 6) + 0.0 AS median_value,
       round(any_value(m.mad), 6) + 0.0 AS mad_value,
       CAST(COALESCE(SUM(CASE WHEN m.mad > 0
                 AND abs(0.6745 * (d.value - d.med) / m.mad) > 3.5
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (user_id)
GROUP BY d.user_id
""",
)
def robust_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier stats: median, MAD, and the count of
    events beyond the modified z-score |0.6745·(x−med)/MAD| > 3.5
    (Iglewicz-Hoban) — the outlier rule that, unlike mean/std z-scores,
    doesn't let the outliers inflate their own threshold (A13/A15
    robustness twin). Two user-keyed exact-percentile aggregations +
    one join back; exact oracle."""
    df = load_table(spark, sf_dir, "events")
    med = df.groupBy("user_id").agg(
        F.round(F.percentile("value", F.lit(0.5)), 9).alias("med")
    )
    dev = df.join(med, "user_id").select(
        "user_id", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("user_id").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 9).alias("mad")
    )
    flagged = dev.join(mad, "user_id")
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.first("med"), 6) + F.lit(0.0)).alias("median_value"),
        (F.round(F.first("mad"), 6) + F.lit(0.0)).alias("mad_value"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("mad") > 0)
                    & (
                        F.abs(
                            F.lit(0.6745)
                            * (F.col("value") - F.col("med"))
                            / F.col("mad")
                        )
                        > 3.5
                    ),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_outliers"),
    )


@register(
    "cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT epoch_ms(date_trunc('day', ts)) AS day_ms,
         round(round(CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE), 6)
               / COUNT(*), 6) AS day_mean
  FROM events GROUP BY 1
),
grand AS (
  SELECT round(round(SUM(day_mean), 6) / COUNT(*), 6) AS gmean FROM daily
),
dev AS (
  SELECT d.day_ms, round(d.day_mean - g.gmean, 6) AS dev
  FROM daily d CROSS JOIN grand g
),
cus AS (
  SELECT day_ms,
         round(SUM(dev) OVER (ORDER BY day_ms
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cusum
  FROM dev
)
SELECT day_ms AS change_day_ms,
       abs(cusum) + 0.0 AS max_abs_cusum,
       (SELECT COUNT(*) FROM cus) AS n_days
FROM cus
ORDER BY abs(cusum) DESC, day_ms
LIMIT 1
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point localization over the daily mean amount: the
    day where the cumulative deviation from the grand mean peaks is the
    most likely level-shift point (Page 1954) — PSI/KS say WHETHER the
    distribution moved, this says WHEN. The running sum uses the
    range-partitioned two-pass prefix scan (`operators/prefix.py`), so
    even a years-long daily series never hits a single-partition window;
    the final argmax is a TakeOrderedAndProject."""
    from ..operators.prefix import global_cumsum

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms")
    ).agg(
        F.round(
            F.round(
                F.sum(F.col("value").cast("decimal(25,2)")).cast("double"), 6
            )
            / F.count(F.lit(1)),
            6,
        ).alias("day_mean")
    )
    grand = daily.agg(
        F.round(
            F.round(F.sum("day_mean"), 6) / F.count(F.lit(1)), 6
        ).alias("gmean")
    )
    dev = daily.crossJoin(F.broadcast(grand)).select(
        "day_ms", F.round(F.col("day_mean") - F.col("gmean"), 6).alias("dev")
    )
    cus = global_cumsum(dev, "day_ms", ["dev"]).select(
        "day_ms", F.round(F.col("cum_dev"), 6).alias("cusum")
    )
    n_days = cus.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        cus.crossJoin(F.broadcast(n_days))
        .select(
            F.col("day_ms").alias("change_day_ms"),
            (F.abs(F.col("cusum")) + F.lit(0.0)).alias("max_abs_cusum"),
            "n_days",
        )
        .orderBy(F.col("max_abs_cusum").desc(), F.col("change_day_ms"))
        .limit(1)
    )
