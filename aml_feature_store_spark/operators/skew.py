"""Hot-key skew handling (SURVEY §4 'skew handling').

The reference's data is skewed by design: 20-30% of traffic hits the top
100 customers (offline_data/generate_sample_data.py:34-37,
producer/transaction_producer.py:82-85). At 100 TB a single hot entity
can stall an aggregation task. Remedies the engine applies:

- **AQE skew-join splitting** — on by default in the session factory.
- **Two-level salted aggregation** (this module): groupBy((key, salt))
  partial-aggregate, then groupBy(key) final merge. Correct for any
  algebraic aggregate (sum/count/min/max and decimal sums); results are
  identical to the direct plan because decimal/integer partials are
  order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEC = "decimal(25,2)"


def salted_agg_sum_count(
    df: DataFrame,
    key_col: str,
    amount_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe (key → exact sum, count, min, max): two-level aggregation
    over a random salt. Output identical to the direct groupBy."""
    salted = df.withColumn("_salt", (F.rand(0) * n_salts).cast("int"))
    lvl1 = salted.groupBy(key_col, "_salt").agg(
        F.sum(F.col(amount_col).cast(DEC)).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
        F.min(amount_col).alias("_min"),
        F.max(amount_col).alias("_max"),
    )
    return lvl1.groupBy(key_col).agg(
        F.sum("_s").cast("double").alias("sum_value"),
        F.sum("_n").alias("n_rows"),
        F.min("_min").alias("min_value"),
        F.max("_max").alias("max_value"),
    )


def direct_agg_sum_count(df: DataFrame, key_col: str, amount_col: str) -> DataFrame:
    """The unsalted plan, for equivalence testing."""
    return df.groupBy(key_col).agg(
        F.sum(F.col(amount_col).cast(DEC)).cast("double").alias("sum_value"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min(amount_col).alias("min_value"),
        F.max(amount_col).alias("max_value"),
    )
