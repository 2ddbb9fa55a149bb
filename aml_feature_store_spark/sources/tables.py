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

from pyspark.sql import types as T

from ..schemas import EVENTS, EVENTS_RAW, TESTDATA_SCHEMAS


def events_ts_is_nanos_long(spark: SparkSession, path: str) -> bool:
    """Sniff the on-disk layout of ``events.ts`` from the parquet footer.

    Two layouts exist in the wild: TIMESTAMP(NANOS) — which Spark's µs
    TimestampType cannot hold, so the session reads it as epoch-nanos
    LongType under spark.sql.legacy.parquet.nanosAsLong — and native
    TIMESTAMP_MICROS, which Spark infers as Timestamp(NTZ). A metadata-only
    schema read (no data scan) tells them apart.
    """
    return isinstance(
        spark.read.parquet(path).schema["ts"].dataType, T.LongType
    )


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch-load the event log with ``ts`` normalized to the engine-standard
    µs TimestampType (UTC session), whatever the on-disk timestamp unit.

    Nanos layout: read as epoch-ns long, `ts div 1000` (exact integer math —
    no double round-trip; 2024 epoch-ns > 2^53). Micros layout: pin the
    TimestampType schema directly — the µs int64 is read natively with no
    conversion expression at all.
    """
    if events_ts_is_nanos_long(spark, path):
        df = spark.read.schema(EVENTS_RAW).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(EVENTS).parquet(path)


def stream_events(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`load_events` — same dtype-adaptive decode,
    single shared implementation for every readStream over the event log."""
    nanos = events_ts_is_nanos_long(spark, source_dir)
    reader = spark.readStream.schema(EVENTS_RAW if nanos else EVENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)
    if nanos:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table with its pinned schema.

    ``events`` goes through the dtype-adaptive :func:`load_events` so the
    engine accepts both TIMESTAMP(NANOS) and TIMESTAMP_MICROS event logs.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return load_events(spark, path)
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
