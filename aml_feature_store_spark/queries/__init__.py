"""Modules whose import registers queries into the catalog."""

from . import (  # noqa: F401
    advanced,
    behavioral,
    coverage,
    graph_features,
    joins_scoring,
    llm_pipeline,
    merchant_features,
    relational,
    serving,
    stat_features,
    streaming_queries,
    training,
    window_features,
    windowed_stats,
)
