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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-event multi-window trailing features on sf0.001."""
    from aml_feature_store_spark.queries.window_features import (
        trailing_multiwindow_features,
    )

    return trailing_multiwindow_features(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
