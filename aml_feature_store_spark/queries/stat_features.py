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
