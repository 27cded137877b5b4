"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extends the reference's file-as-table surface (``TABLE(LIST_FILES(...))`` ->
rows of file handles, ``/root/reference/industry-examples/ai_generate.sql:
19-21``, ``logistics_AI.sql:309-358``; Spark's ``binaryFile`` source) into
first-class multimodal columns: image/audio/video carried as ``binary`` with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The actual codecs (image decode, audio resample, video frame-sample) are NOT
available in this container — the decode step is stubbed behind
``DecoderUnavailable`` with a deterministic fake, clearly marked. The Spark
plumbing (schema, batch shape, partitioning, UDF signatures) is real and
tested; swapping the fake for Pillow/ffmpeg is a backend change only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class DecoderUnavailable(NotImplementedError):
    """Raised by real decode paths; tests use the deterministic fake."""


def decode_image(payload: bytes):  # pragma: no cover - real path
    raise DecoderUnavailable("image codecs not installed in this environment")


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic fake 'dimensions' derived from content
    bytes (stands in for width/height/format until a codec is present)."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    fmt = ["png", "jpeg", "webp"][digest[2] % 3]
    return width, height, fmt


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("format", StringType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: text payloads as
    opaque blobs (the image/audio libs are absent; payloads are just bytes
    to this layer anyway)."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; each batch is a pandas DataFrame so a real decoder would
    amortize model/codec setup per batch, not per row. Map-only: scales
    linearly, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            metas = [fake_decode_meta(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_md5": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
