"""Equivalence pin for schemas.prop_k_fast — the regexp-based events.props
"k" extraction used on the hot graph paths — against the general
``from_json(props, EVENT_PROPS)["k"]`` parse, over the whole contract
domain of props payloads (flat JSON object, optional integer ``k``)
including every null/malformed edge the sources can produce. If the
generator's props format ever drifts, this reddens before any oracle."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from aml_feature_store_spark.schemas import EVENT_PROPS, prop_k_fast

CONTRACT_PAYLOADS = [
    '{"k": 0}',
    '{"k": 7}',
    '{"k": 99}',
    '{"k": 1234567890123}',  # full long range
    '{"k":5}',  # no space
    '{"k":  42}',  # extra whitespace
    '{"k": -3}',  # negative (schema allows LongType)
    '{"j": 2, "k": 17}',  # extra keys before
    '{"k": 17, "j": 2}',  # extra keys after
    '{"j": 2}',  # missing k
    "{}",  # empty object
    "",  # empty string
    None,  # null props
]


def test_prop_k_fast_equals_from_json_on_contract_domain(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(CONTRACT_PAYLOADS)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("props", T.StringType()),
            ]
        ),
    )
    rows = (
        df.select(
            "id",
            F.from_json("props", EVENT_PROPS)["k"].alias("slow"),
            prop_k_fast().alias("fast"),
        )
        .orderBy("id")
        .collect()
    )
    for r in rows:
        assert r["fast"] == r["slow"], (
            CONTRACT_PAYLOADS[r["id"]],
            r["slow"],
            r["fast"],
        )


def test_prop_k_fast_documented_divergence_nested(spark):
    """Outside the contract (nested objects) the two parses DIVERGE —
    pinned so the docstring's caveat stays true and anyone extending the
    props contract to nesting revisits prop_k_fast first."""
    df = spark.createDataFrame(
        [('{"a": {"k": 3}}',)], "props string"
    )
    row = df.select(
        F.from_json("props", EVENT_PROPS)["k"].alias("slow"),
        prop_k_fast().alias("fast"),
    ).first()
    assert row["slow"] is None and row["fast"] == 3
