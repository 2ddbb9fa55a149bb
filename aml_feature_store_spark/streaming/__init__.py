"""Structured Streaming operators (SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def console_sink(stream: DataFrame, truncate: bool = False, num_rows: int = 20):
    """Debug console sink (S7; reference stream.print(),
    aml_stream_processor.py:373-374). Returns the started query."""
    return (
        stream.writeStream.format("console")
        .option("truncate", str(truncate).lower())
        .option("numRows", str(num_rows))
        .start()
    )
