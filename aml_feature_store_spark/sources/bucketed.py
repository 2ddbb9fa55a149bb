"""Bucketed table layout for shuffle-free co-located joins (SURVEY §4 /
guide 'Partitioning & shuffle').

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
both sides bucketed (+ sorted) by the join key lets Spark's
FileSourceScanExec expose the bucketing as an output partitioning, so the
SortMergeJoin runs with ZERO Exchange. This module wraps the
``bucketBy().sortBy().saveAsTable()`` incantation (bucketing requires a
managed/catalog table, not a bare path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df bucketed + sorted by key as a catalog table."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plan must show
    no Exchange (verified by tests/test_bucketed.py)."""
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, key)
