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


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha256", StringType()),
    ]
)


def frame_sample(df: DataFrame, frame_size: int = 64, every_n: int = 4) -> DataFrame:
    """Frame sampling over binary payloads via ``mapInPandas``: each
    payload is treated as a sequence of fixed-size frames (standing in
    for video frames — a real decoder would come from
    :func:`decode_media`); every ``every_n``-th frame is emitted as its
    own row. One input row fans out to many output rows inside the
    Arrow batch — the exact shape a video→frames exploder needs; at
    scale the output is repartitioned by downstream keys, and payload
    bytes never pass through the driver."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            hashes: list[str] = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                data = decode_media(bytes(payload), meta.get("mime", "application/octet-stream"))
                n_frames = (len(data) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_n):
                    frame = data[i * frame_size : (i + 1) * frame_size]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sizes.append(len(frame))
                    hashes.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_sha256": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_sha256", StringType()),
    ]
)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image-resize plumbing via ``mapInPandas``: decode → resize →
    re-emit a fixed-size payload summary. The geometric resize itself
    needs an image library (Pillow) and is stubbed in
    :func:`decode_media` terms — for the ``text/plain`` fake the
    "resize" is a deterministic truncate/cycle of the payload to
    width·height bytes, so batch shape, schema, and determinism are
    fully exercised. Swap the inner function for a Pillow call and
    nothing else changes."""
    target = width * height

    def _resize_bytes(data: bytes) -> bytes:
        if not data:
            return bytes(target)
        reps = (target + len(data) - 1) // len(data)
        return (data * reps)[:target]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "resized_bytes": [], "resized_sha256": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                data = decode_media(bytes(payload), meta.get("mime", "application/octet-stream"))
                r = _resize_bytes(data)
                out["doc_id"].append(int(doc_id))
                out["width"].append(width)
                out["height"].append(height)
                out["resized_bytes"].append(len(r))
                out["resized_sha256"].append(hashlib.sha256(r).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "resized_bytes": pd.Series(out["resized_bytes"], dtype="int64"),
                    "resized_sha256": pd.Series(out["resized_sha256"], dtype="object"),
                }
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


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
