"""Explicit StructType schemas for every source the engine reads.

Policy (SURVEY.md §1.3): never ``inferSchema`` on the hot path — a schema
mismatch at 100 TB is a silent full-scan disaster. All timestamps UTC.

The transaction-stream schema mirrors the reference's Kafka message
(reference: producer/transaction_producer.py:126-138); the testdata
schemas mirror the driver-generated parquet in /root/testdata (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

# --- driver testdata tables (FIXTURES.md §B) --------------------------------

# NOTE: the on-disk unit of `ts` has changed across testdata generations
# (TIMESTAMP(NANOS) then TIMESTAMP_MICROS). EVENTS_RAW is the legacy-nanos
# read schema (LongType under spark.sql.legacy.parquet.nanosAsLong=true);
# sources.tables.load_events sniffs the footer and picks the right path.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# JSON payload carried in events.props (exercises F4 from_json)
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])


def prop_k_fast(col: str = "props") -> Column:
    """events.props "k" extraction specialized to the closed props
    contract (a flat JSON object whose only schema field is the integer
    ``k`` — EVENT_PROPS above): the same regexp the DuckDB oracles
    already use, measured 6× cheaper than the general
    ``from_json(...)["k"]`` parse at the 10M-event anchor (0.54 vs
    3.36 s for the parse+agg pass — from_json dominated every graph
    query's scan). Bit-equal to from_json on the contract domain
    INCLUDING null / empty-string / missing-k / extra-key / whitespace
    variants (pytest-pinned in tests/test_prop_k.py); NOT equivalent on
    nested JSON where "k" appears below the top level, which the props
    contract excludes. The F4 surface query ``props_json_extract``
    deliberately keeps the general from_json path.
    """
    return F.nullif(
        F.regexp_extract(F.col(col), r'"k":\s*(-?\d+)', 1), F.lit("")
    ).cast("long")

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
}

# --- reference transaction-stream schema (FIXTURES.md §A1/A2) ---------------
# reference: offline_data/generate_sample_data.py:65-75 and
# producer/transaction_producer.py:126-138

TRANSACTION = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("merchant_id", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("ip_address", T.StringType()),
        T.StructField("event_timestamp", T.TimestampType()),
        T.StructField("is_weekend", T.BooleanType()),
        T.StructField("hour_of_day", T.IntegerType()),
        T.StructField("is_suspicious", T.BooleanType()),
        T.StructField("processing_timestamp", T.TimestampType()),
        T.StructField("is_night_transaction", T.BooleanType()),
        T.StructField("profile_risk_level", T.StringType()),
    ]
)

# Feedback-loop relational tables (reference: feedback/feedback_system.py:39-85)
FEEDBACK = T.StructType(
    [
        T.StructField("feedback_id", T.LongType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("predicted_score", T.DoubleType()),
        T.StructField("predicted_label", T.IntegerType()),
        T.StructField("actual_label", T.IntegerType()),
        T.StructField("analyst_id", T.StringType()),
        T.StructField("feedback_timestamp", T.TimestampType()),
        T.StructField("confidence_level", T.IntegerType()),
        T.StructField("comments", T.StringType()),
        T.StructField("investigation_outcome", T.StringType()),
    ]
)
