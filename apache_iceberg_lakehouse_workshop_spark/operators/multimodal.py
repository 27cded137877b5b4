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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Image resize stage (training-pipeline preprocessing). The real path
    is Pillow inside the batch loop (``decode_image``); the stub produces a
    deterministic fake: scaled fake dimensions + a payload digest-slice
    standing in for re-encoded bytes. Plumbing is real: Arrow batches,
    map-only, output schema carries payload + final dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for p in pdf["payload"]:
                raw = bytes(p)
                w, h, _fmt = fake_decode_meta(raw)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                # fake re-encode: content-derived, size-proportional bytes
                digest = hashlib.md5(raw).digest()
                out_payload.append(bytes(digest * max(1, (nw * nh) // 16 // len(digest))))
                out_w.append(nw)
                out_h.append(nh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "mime": pdf["mime"],
                    "width": out_w,
                    "height": out_h,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: one input row → ``n_frames`` output rows
    (uniform timestamps). Real path = ffmpeg per batch; the stub emits
    deterministic content-derived frame bytes. The 1→N row expansion inside
    ``mapInPandas`` is the part that matters at scale: no explode over a
    pre-built array column (which would materialize all frames in one row),
    frames stream out of the worker batch by batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, mss, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                # fake duration: content-derived, stable
                duration_ms = 1000 + int.from_bytes(hashlib.md5(raw).digest()[:2], "big")
                for i in range(n_frames):
                    ids.append(mid)
                    nos.append(i)
                    mss.append(i * duration_ms // n_frames)
                    # fake frame payload: the per-frame digest's hex string
                    # as bytes (UTF-8-safe, so downstream digests of the
                    # frame are replicable in any engine's SQL)
                    frames.append(hashlib.md5(raw + bytes([i])).hexdigest().encode())
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame_ms": mss, "frame": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
