"""Feature-view registry — the engine's Feast-equivalent control plane
(SURVEY §1.1, §3 'secondary entry points'; reference:
feature_repo/definitions.py:27-79, feature_store.yaml).

A feature view = (name, entity key, feature schema, TTL, online flag) with
a builder that produces the view's DataFrame from the event log. The
registry is plain Python (no external service): `feast apply` becomes
"import this module"; `get_historical_features` is the PIT join (J2);
`get_online_features` is OnlineStore.lookup (J1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, types as T


@dataclass(frozen=True)
class FeatureView:
    name: str
    entity_col: str
    ttl_s: int
    online: bool
    features: dict[str, T.DataType]
    builder: Callable[[DataFrame], DataFrame] | None = None
    description: str = ""


_REGISTRY: dict[str, FeatureView] = {}


def register_view(view: FeatureView) -> FeatureView:
    _REGISTRY[view.name] = view
    return view


def get_view(name: str) -> FeatureView:
    return _REGISTRY[name]


def list_views() -> list[str]:
    return sorted(_REGISTRY)


def _f32() -> T.DataType:
    return T.FloatType()


def _i64() -> T.DataType:
    return T.LongType()


# the three declared reference views (feature_repo/definitions.py), with
# engine column names; builders wire to the corresponding operators
register_view(
    FeatureView(
        name="customer_transaction_features",
        entity_col="user_id",
        ttl_s=86400,
        online=True,
        features={
            "txn_count_1h": _i64(),
            "txn_amount_sum_1h": T.DoubleType(),
            "avg_txn_amount_1h": T.DoubleType(),
            "max_txn_amount_1h": T.DoubleType(),
            "min_txn_amount_1h": T.DoubleType(),
            "std_txn_amount_1h": T.DoubleType(),
            "velocity_score_1h": T.DoubleType(),
        },
        description="trailing-window transaction aggregates per customer "
        "(reference feature_repo/definitions.py:27-46)",
    )
)

register_view(
    FeatureView(
        name="merchant_transaction_features",
        entity_col="event_type",
        ttl_s=86400,
        online=True,
        features={
            "txn_count_1h": _i64(),
            "txn_amount_sum_1h": T.DoubleType(),
            "avg_txn_amount_1h": T.DoubleType(),
            "unique_user_id_1h": _i64(),
        },
        description="merchant-side trailing aggregates "
        "(reference feature_repo/definitions.py:49-62)",
    )
)

register_view(
    FeatureView(
        name="customer_behavioral_features",
        entity_col="user_id",
        ttl_s=86400,
        online=True,
        features={
            "unique_event_type_1h": _i64(),
            "night_txn_count_24h": _i64(),
            "night_txn_ratio_24h": T.DoubleType(),
            "gini_amount": T.DoubleType(),
            "concentration_hhi": T.DoubleType(),
            "hour_entropy": T.DoubleType(),
            "burst_ratio": T.DoubleType(),
        },
        description="behavioral/statistical features per customer "
        "(reference feature_repo/definitions.py:65-79 + advanced set)",
    )
)
