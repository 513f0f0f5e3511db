"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides through the engine as ``binary`` columns with
a typed metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested; the actual
codec work (JPEG decode, resampling, frame extraction) is STUBBED behind
``real=False`` because the image/audio libraries are not in this container:
with ``real=True`` the operators raise ``NotImplementedError`` at the exact
call site where PIL/ffmpeg would plug in, and with the default deterministic
fake they derive metadata/features purely from the payload bytes so tests can
pin the dataflow end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_md5", StringType()),
    StructField("frame_bytes", BinaryType()),
])


def attach_payload(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Lift a text corpus into a media table: payload = utf-8 bytes of the
    text (deterministic stand-in for real media blobs)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake of a codec header parse."""
    n = len(payload)
    return (n % 1920 + 1, (n * 7) % 1080 + 1, (n * 13) % 60000)


def extract_media_meta(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode headers -> typed metadata. Arrow-batched ``mapInPandas``; one
    pass, no shuffle. ``real=True`` is where PIL/libav would be called."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                payload = bytes(r.payload)
                if real:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg; not available "
                        "in this environment")
                w, h, d = _fake_decode(payload)
                out.append({
                    "media_id": r.media_id,
                    "kind": r.kind,
                    "n_bytes": len(payload),
                    "content_md5": hashlib.md5(payload).hexdigest(),
                    "width": w, "height": h, "duration_ms": d,
                })
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_META_SCHEMA])

    return media.mapInPandas(run, MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 4, real: bool = False) -> DataFrame:
    """Frame sampling: one output row per sampled frame (1 -> N explode shape
    inside the Arrow stage). The fake samples ``every_n_bytes`` windows of the
    payload; the real path would seek keyframes."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                payload = bytes(r.payload)
                if real:
                    raise NotImplementedError(
                        "real frame extraction requires ffmpeg")
                for i in range(min(max_frames,
                                   max(1, len(payload) // every_n_bytes))):
                    chunk = payload[i * every_n_bytes:(i + 1) * every_n_bytes]
                    out.append({
                        "media_id": r.media_id,
                        "frame_idx": i,
                        "frame_md5": hashlib.md5(chunk).hexdigest(),
                        "frame_bytes": chunk,
                    })
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA])

    return media.mapInPandas(run, FRAME_SCHEMA)
