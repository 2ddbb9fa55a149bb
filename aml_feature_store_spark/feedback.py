"""Feedback-loop relational store (SURVEY §2.1 S8, §3 'feedback loop';
reference: feedback/feedback_system.py:33-153 SQLite tables).

Spark-first: the three tables (analyst feedback, model_performance,
drift_metrics) are append-only parquet tables written through a tiny
typed API; reads are filtered scans (`spark.sql` works against the
registered views). With Delta on the classpath these become ACID tables —
the API is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

FEEDBACK_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("predicted_score", T.DoubleType()),
        T.StructField("predicted_label", T.IntegerType()),
        T.StructField("actual_label", T.IntegerType()),
        T.StructField("analyst_id", T.StringType()),
        T.StructField("feedback_timestamp", T.TimestampType()),
        T.StructField("confidence_level", T.IntegerType()),
        T.StructField("comments", T.StringType()),
        T.StructField("investigation_outcome", T.StringType()),
    ]
)

MODEL_PERFORMANCE_SCHEMA = T.StructType(
    [
        T.StructField("model_version", T.StringType()),
        T.StructField("training_timestamp", T.TimestampType()),
        T.StructField("validation_auc", T.DoubleType()),
        T.StructField("test_auc", T.DoubleType()),
        T.StructField("precision", T.DoubleType()),
        T.StructField("recall", T.DoubleType()),
        T.StructField("f1_score", T.DoubleType()),
        T.StructField("feature_count", T.IntegerType()),
        T.StructField("training_samples", T.LongType()),
        T.StructField("is_active", T.BooleanType()),
    ]
)

DRIFT_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("metric_timestamp", T.TimestampType()),
        T.StructField("feature_name", T.StringType()),
        T.StructField("drift_score", T.DoubleType()),
        T.StructField("drift_detected", T.BooleanType()),
        T.StructField("reference_period_start", T.TimestampType()),
        T.StructField("reference_period_end", T.TimestampType()),
        T.StructField("current_period_start", T.TimestampType()),
        T.StructField("current_period_end", T.TimestampType()),
    ]
)

_SCHEMAS = {
    "feedback": FEEDBACK_SCHEMA,
    "model_performance": MODEL_PERFORMANCE_SCHEMA,
    "drift_metrics": DRIFT_METRICS_SCHEMA,
}


class FeedbackStore:
    """Append-only relational store on a base path."""

    def __init__(self, spark: SparkSession, base_path: str) -> None:
        self.spark = spark
        self.base = base_path

    def _path(self, table: str) -> str:
        if table not in _SCHEMAS:
            raise KeyError(f"unknown feedback table {table!r}")
        return os.path.join(self.base, table)

    def insert(self, table: str, rows: list[dict] | DataFrame) -> None:
        schema = _SCHEMAS[table]
        df = (
            rows
            if isinstance(rows, DataFrame)
            else self.spark.createDataFrame(
                [tuple(r.get(f.name) for f in schema.fields) for r in rows],
                schema,
            )
        )
        df.write.mode("append").parquet(self._path(table))

    def read(self, table: str, since=None, until=None,
             ts_col: str | None = None) -> DataFrame:
        p = self._path(table)
        if not os.path.exists(p):
            return self.spark.createDataFrame([], _SCHEMAS[table])
        df = self.spark.read.schema(_SCHEMAS[table]).parquet(p)
        tc = ts_col or {
            "feedback": "feedback_timestamp",
            "model_performance": "training_timestamp",
            "drift_metrics": "metric_timestamp",
        }[table]
        if since is not None:
            df = df.filter(F.col(tc) >= F.lit(since))
        if until is not None:
            df = df.filter(F.col(tc) <= F.lit(until))
        return df

    def recent_accuracy(self, days: int = 7, now=None) -> DataFrame:
        """The retrain-decision aggregate (feedback_system.py:241-273):
        accuracy + counts over the trailing feedback window."""
        fb = self.read("feedback")
        if now is None:
            mx = fb.agg(F.max("feedback_timestamp")).collect()[0][0]
            now = mx
        cutoff = F.lit(now) - F.expr(f"INTERVAL {days} DAYS")
        recent = fb.filter(F.col("feedback_timestamp") >= cutoff)
        return recent.agg(
            F.count(F.lit(1)).alias("n_feedback"),
            F.avg(
                (F.col("predicted_label") == F.col("actual_label")).cast("double")
            ).alias("accuracy"),
            F.sum(F.col("actual_label")).alias("n_true_positives_labeled"),
        )
