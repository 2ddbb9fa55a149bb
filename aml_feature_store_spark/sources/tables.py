"""Batch sources: schema-pinned parquet scans over the offline store.

Operator S1 (reference: notebooks/aml_analysis.ipynb cell4, pandas
read_parquet; feature_repo/definitions.py:20-24 FileSource). Spark-first:
``spark.read.schema(...).parquet(path)`` so Catalyst gets column pruning +
predicate pushdown into the parquet row groups for free.

Scale notes: at 100 TB the event log must be laid out
``partitionBy(event_date)`` (see sinks.write_event_log) so time-range
predicates become partition pruning, not row-group filtering.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import EVENTS_RAW, TESTDATA_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table with its pinned schema.

    ``events.ts`` is stored as TIMESTAMP(NANOS); it is read as epoch-nanos
    long (session sets spark.sql.legacy.parquet.nanosAsLong) and converted
    here to the engine-standard µs TimestampType (UTC). `ts div 1000` is
    exact integer math — no double round-trip (2024 epoch-ns > 2^53).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = spark.read.schema(EVENTS_RAW).parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    schema = TESTDATA_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_SCHEMAS}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def isolate_events_files(sf_dir: str) -> str:
    """Copy the events parquet data into a fresh temp dir holding ONLY
    events files — file-streaming over an sf dir would otherwise pick up
    every table's parquet. Handles both layouts: the shipped single-file
    events.parquet and a directory of part files (generated scale dirs).
    """
    import glob as _glob
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="stream_src_")
    p = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(p):
        for i, f in enumerate(sorted(_glob.glob(os.path.join(p, "*.parquet")))):
            shutil.copy(f, os.path.join(src, f"events_{i:05d}.parquet"))
    else:
        shutil.copy(p, src)
    return src
