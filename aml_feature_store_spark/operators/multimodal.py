"""Multimodal (image/audio/video) column plumbing (SURVEY §2.11 X5).

Convention: multimodal payloads are opaque ``binary`` columns travelling
next to typed metadata columns (modality, byte size, content digest,
format header). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row
objects — the batch shape, partitioning and schema handling here are the
real thing; only the codec call is stubbed (image/audio libraries are not
in this container).

Scale notes: payloads skew partition sizes — repartition by a digest
prefix before decode so one executor doesn't get all the large blobs;
keep ``spark.sql.files.maxPartitionBytes`` small for blob-heavy scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def binarize_documents(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a multimodal-shaped table: the UTF-8
    payload plays the opaque blob; metadata columns are first-class."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("modality"),
        F.length(payload).alias("n_bytes"),
        F.lower(F.hex(F.substring(payload, 1, 4))).alias("header_hex"),
        F.md5(payload).alias("payload_md5"),
    )


def extract_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched fake 'decode': byte stats + header-derived fake
    dimensions per payload. Replace `_decode_batch`'s body with a real
    codec (PIL/libvips) when available — the Spark-side plumbing
    (mapInPandas, schema, batch shape) is identical either way."""

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "header_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    # deterministic fake dimensions from the first bytes —
                    # stands in for a real header parse
                    "width": payloads.map(
                        lambda b: int(b[0]) % 64 + 1 if len(b) else 0
                    ).astype("int32"),
                    "height": payloads.map(
                        lambda b: int(b[1]) % 64 + 1 if len(b) > 1 else 0
                    ).astype("int32"),
                }
            )
            yield out

    return df.select("doc_id", payload_col).mapInPandas(
        _decode_batch, schema=FEATURE_SCHEMA
    )


def real_decode_stub(*_args, **_kwargs):
    """Placeholder for the real image/audio decode path.

    Raises until a codec library (PIL / torchaudio / decord) is installed;
    `extract_image_features` is the tested plumbing that would host it.
    """
    raise NotImplementedError(
        "real multimodal decode requires an image/audio codec library "
        "not present in this environment; use extract_image_features "
        "(deterministic fake) for pipeline testing"
    )
