"""Tier X multimodal column plumbing (SURVEY.md §2.3).

Images/audio/video are opaque ``binary`` payloads plus typed metadata
(``map<string,string>``). The Spark-side machinery — schema, Arrow
batch shape, mapInPandas feature extraction, partition behavior — is
real and tested; the actual media decode is STUBBED (the container has
no image/audio libraries) behind :func:`decode_media`, which raises
``NotImplementedError`` for real media types and provides a
deterministic fake for ``text/plain`` payloads so the pipeline is
end-to-end testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("sha256", StringType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a source column as a multimodal (payload, meta) pair: the
    payload is the utf-8 bytes (standing in for image/audio bytes), the
    metadata map carries mime + provenance. At 100 TB the payload column
    stays columnar parquet binary; metadata predicates (mime, source)
    push down without touching payload bytes."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("mime"), F.lit("text/plain"),
            F.lit("source"), F.col("source"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str) -> bytes:
    """STUB decode step. Real image/audio/video decoding requires
    libraries not present in this container; the Spark-side contract
    (bytes in, bytes out, called per element inside an Arrow batch) is
    what matters here."""
    if mime == "text/plain":
        return payload  # deterministic fake: identity "decode"
    raise NotImplementedError(
        f"decode for mime={mime!r} requires a media library; wire Pillow/librosa/av here"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched, one Python process per task, zero row-at-a-time
    overhead. Output is a narrow typed frame (id, byte_len, first_byte,
    sha256) — the shape a real image-embedding or EXIF extractor
    produces."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                decode_media(bytes(p), m.get("mime", "application/octet-stream"))
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "first_byte": pd.Series([p[0] if len(p) else -1 for p in payloads], dtype="int32"),
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)
