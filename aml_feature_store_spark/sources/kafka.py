"""Kafka stream source/sink builders (SURVEY §2.1 S3/S4).

The reference consumes topic `transactions` with a string schema and
produces JSON keyed by customer_id for per-key ordering (reference:
flink_job/aml_stream_processor.py:340-360,
producer/transaction_producer.py:24-33,150-155).

Spark-first: ``readStream.format("kafka")`` → ``from_json`` with the
pinned TRANSACTION schema; the producer side is ``to_json(struct(*))``
keyed by the entity. The spark-sql-kafka connector jar is NOT in this
container, so builders raise a clear error if the format is unavailable;
unit tests cover the pure transformations (parse/serialize round-trip)
via in-memory frames instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import TRANSACTION

TOPIC_DEFAULT = "transactions"


def parse_kafka_value(raw: DataFrame, schema: T.StructType = TRANSACTION) -> DataFrame:
    """value(binary JSON) → typed columns (F4). Works on any DataFrame with
    a `value` column — the unit-testable half of the source."""
    return (
        raw.select(F.col("value").cast("string").alias("_json"))
        .select(F.from_json("_json", schema).alias("_r"))
        .select("_r.*")
    )


def to_kafka_records(
    df: DataFrame, key_col: str = "customer_id"
) -> DataFrame:
    """typed columns → (key, value) JSON records keyed for per-entity
    ordering (S4) — the unit-testable half of the sink."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def read_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = TOPIC_DEFAULT,
    starting_offsets: str = "latest",
    schema: T.StructType = TRANSACTION,
) -> DataFrame:
    """Kafka → typed streaming DataFrame (requires spark-sql-kafka jar)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - jar not present here
        raise RuntimeError(
            "kafka connector not on classpath; add spark-sql-kafka-0-10 "
            "to spark.jars.packages"
        ) from e
    return parse_kafka_value(raw, schema)


def write_stream(
    df: DataFrame,
    brokers: str,
    topic: str = TOPIC_DEFAULT,
    key_col: str = "customer_id",
    checkpoint: str | None = None,
):
    """Typed stream → Kafka JSON keyed by entity (requires connector jar)."""
    records = to_kafka_records(df, key_col)
    writer = (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
