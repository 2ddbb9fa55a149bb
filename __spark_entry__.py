"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over aml_feature_store_spark.catalog — every implemented
operator from SURVEY.md §2 is registered there with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aml_feature_store_spark import catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# session confs the engine's semantics rely on; all runtime-settable, so
# they apply even when the caller built its own SparkSession
_REQUIRED_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    # legacy-testdata tolerance: if events.ts is ever TIMESTAMP(NANOS)
    # again, this makes it load as epoch-ns long, which load_events then
    # detects and converts (without it the schema sniff itself throws)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _ensure_conf(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-event multi-window trailing features on sf0.001."""
    from aml_feature_store_spark.queries.window_features import (
        trailing_multiwindow_features,
    )

    return trailing_multiwindow_features(_ensure_conf(spark), SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_ensure_conf(spark), sf_dir)

    run.__doc__ = fn.__doc__
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
