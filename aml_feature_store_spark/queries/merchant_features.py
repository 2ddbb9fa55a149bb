"""Registered query: merchant-side trailing feature view (the reference's
merchant_transaction_features, feature_repo/definitions.py:49-62) — the
same trailing-window operator parameterized on the merchant entity
(SURVEY §2.9 T2: the second key_by over the same stream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register
from ..operators.windows import (
    TrailingWindowSpec,
    trailing_features_auto,
    trailing_features_sql_oracle,
)
from ..sources import load_table

SPEC_MERCHANT = TrailingWindowSpec(
    entity_col="event_type",
    windows={"1h": 3600},
    distinct_cols=("user_id",),
)

_COLS = [
    "event_id",
    "event_type",
    "txn_count_1h",
    "txn_amount_sum_1h",
    "avg_txn_amount_1h",
    "max_txn_amount_1h",
    "min_txn_amount_1h",
    "std_txn_amount_1h",
    "velocity_score_1h",
    "unique_user_id_1h",
]


@register(
    "merchant_trailing_features",
    oracle=trailing_features_sql_oracle(SPEC_MERCHANT),
)
def merchant_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1h merchant aggregates incl. exact unique
    customers (merchant_unique_customers_1h analog) — ONE operator serves
    both entity types, vs the reference's two divergent keyed processors
    (aml_stream_processor.py:234-330 MerchantAggregator). Adaptive
    physical strategy: dense frames (few merchant keys, many events) use
    the O(rows) cum+marker plan — exact distincts come from the
    previous-occurrence interval decomposition, not per-frame sets."""
    df = load_table(spark, sf_dir, "events")
    return trailing_features_auto(df, SPEC_MERCHANT).select(*_COLS)
