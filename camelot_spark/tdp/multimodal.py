"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels. The actual codec work is STUBBED (no
image/audio libraries in this environment — see ``decode_image``),
but the Spark-side plumbing — schema, batch shape, partitioning, UDF
signatures — is real and tested; a production deployment swaps the
stub body for PIL/ffmpeg calls without touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("header_byte", IntegerType(), False),
        StructField("fake_width", IntegerType(), False),
        StructField("fake_height", IntegerType(), False),
    ]
)


def attach_fake_payload(documents: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload column from text (the
    corpus has no real media; utf-8 bytes stand in for image bytes)."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real deployments decode with PIL/cv2/ffmpeg here.

    Raises NotImplementedError for real codec formats; the deterministic
    fake below parses our synthetic payload instead.
    """
    raise NotImplementedError("image decoding requires PIL/cv2 — not in this environment")


def _fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: header byte + derived WxH."""
    n = len(payload)
    header = payload[0] if n else 0
    return header, (n % 640) + 1, ((n * 7) % 480) + 1


def _media_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.str.len().astype("int64")
        meta = [_fake_decode_meta(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "header_byte": np.asarray([m[0] for m in meta], dtype="int32"),
                "fake_width": np.asarray([m[1] for m in meta], dtype="int32"),
                "fake_height": np.asarray([m[2] for m in meta], dtype="int32"),
            }
        )


def media_metadata(documents: DataFrame) -> DataFrame:
    """Binary payload → typed metadata via Arrow-batched mapInPandas —
    the decode/feature-extract plan shape for real media columns."""
    with_payload = attach_fake_payload(documents)
    return with_payload.mapInPandas(_media_meta_batches, schema=MEDIA_META_SCHEMA)


MEDIA_META_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ord(text[1:1]) AS INTEGER) AS header_byte,
       CAST((octet_length(encode(text)) % 640) + 1 AS INTEGER) AS fake_width,
       CAST(((octet_length(encode(text)) * 7) % 480) + 1 AS INTEGER) AS fake_height
FROM documents
"""
