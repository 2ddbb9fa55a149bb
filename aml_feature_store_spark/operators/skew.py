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


def skew_split_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot_keys: list,
) -> DataFrame:
    """Skew-safe equi-join: rows whose key is in ``hot_keys`` join against
    a BROADCAST of the dim's hot slice (no shuffle of the hot mass — the
    partition that would hold a hot key never materializes), the cold
    remainder takes the regular shuffled join; the union is
    row-identical to the direct join. ``hot_keys`` is a small driver
    list (top-K by frequency — bounded like every other scalar collect
    in this repo). AQE's skew-join split solves the same problem
    adaptively at runtime; this is the explicit, plan-pinned form for
    engines/settings where it is off."""
    hot_lit = [F.lit(k) for k in hot_keys]
    f_hot = fact.where(F.col(fact_key).isin(*hot_lit))
    f_cold = fact.where(~F.col(fact_key).isin(*hot_lit))
    d_hot = dim.where(F.col(dim_key).isin(*hot_lit))
    d_cold = dim.where(~F.col(dim_key).isin(*hot_lit))
    joined_hot = f_hot.join(
        F.broadcast(d_hot), f_hot[fact_key] == d_hot[dim_key]
    )
    joined_cold = f_cold.join(d_cold, f_cold[fact_key] == d_cold[dim_key])
    return joined_hot.unionByName(joined_cold)
