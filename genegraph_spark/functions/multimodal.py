"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction stages as ``mapInPandas`` stubs.

The real codecs (PIL/ffmpeg/torchaudio) are not in this container, so the
decode step is STUBBED: ``decode_image_batch(..., fake=True)`` produces a
deterministic md5-derived feature vector (so the distributed plumbing —
schema, Arrow batch shapes, partitioning — is real and tested), and
``fake=False`` raises ``NotImplementedError`` where the codec call
belongs. Pattern: binary in, fixed-width struct/array out, one Arrow
batch at a time, constant memory per task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, height int"
)
FEATURE_DIM = 8
DECODED_SCHEMA = f"media_id long, kind string, n_bytes int, feature array<float>"


def make_media_df(spark, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from documents: payload =
    utf-8 bytes of the text (stands in for image bytes), typed metadata."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image").when(F.col(id_col) % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col(id_col) % 640 + 1).cast("int").alias("width"),
        (F.col(id_col) % 480 + 1).cast("int").alias("height"),
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes of the
    md5 digest scaled to [0,1). Stable across engines and retries."""
    d = hashlib.md5(payload).digest()
    return [b / 256.0 for b in d[:FEATURE_DIM]]


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    Real decoding is NOT implemented in this container (no image/audio
    libs); ``fake=False`` raises NotImplementedError inside the task. The
    Spark-side contract (schema, batching, per-partition iteration) is
    identical either way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; install and replace _fake_feature"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": pdf["payload"].map(_fake_feature),
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def resize_images(media: DataFrame, target_w: int = 64, target_h: int = 64, fake: bool = True) -> DataFrame:
    """Resize plumbing for image payloads: binary in → binary out with
    updated dimension metadata, one Arrow batch at a time.

    The pixel work is STUBBED (no PIL in this container): ``fake=True``
    emits a deterministic truncation/padding of the payload sized
    ``target_w*target_h`` bytes so batch shapes and memory behavior are
    real; ``fake=False`` raises where the PIL resize call belongs."""
    out_schema = "media_id long, payload binary, width int, height int"
    n_out = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("real resize requires PIL; replace the stub")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        # NULL/empty payloads zero-fill rather than killing
                        # the task (quarantine upstream is the real handler)
                        lambda b: (b * (n_out // len(b) + 1))[:n_out]
                        if b
                        else b"\x00" * n_out
                    ),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(batches, out_schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx, frame_payload) rows. The split is byte-range slicing as a
    stand-in for keyframe extraction — the explode/partition shape is the
    real thing."""
    video = media.where(F.col("kind") == "video")
    n_frames = F.greatest((F.length("payload") / every_n).cast("int"), F.lit(1))
    return video.select(
        "media_id",
        F.posexplode(F.transform(F.sequence(F.lit(1), n_frames), lambda i: i)).alias(
            "frame_idx", "_i"
        ),
    ).select("media_id", "frame_idx")
