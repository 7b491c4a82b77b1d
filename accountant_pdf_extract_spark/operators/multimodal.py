"""Multimodal column handling for training-data pipelines: media
payloads as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the codec calls themselves are STUBS —
image/audio libraries are not in this container, so ``decode_image``
raises ``NotImplementedError`` unless given the deterministic fake
codec used by the tests (``fake_codec=True`` decodes the synthetic
header written by ``synth_media``).  On a real cluster you swap the
stub body for Pillow/ffmpeg calls; nothing else changes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# media table schema: (media_ref string, modality string, payload binary,
#                      width int, height int, duration_ms int)
MEDIA_SCHEMA = (
    "media_ref string, modality string, payload binary, "
    "width int, height int, duration_ms int"
)

_MAGIC = b"FAKEIMG1"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic synthetic 'image': magic + dims + seeded bytes."""
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=min(width * height, 4096), dtype=np.uint8)
    return _MAGIC + struct.pack("<II", width, height) + body.tobytes()


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Synthetic media table (deterministic)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng([seed, int(i)])
                w = int(rng.integers(16, 512))
                h = int(rng.integers(16, 512))
                rows.append(
                    {
                        "media_ref": f"media://sha/{int(rng.integers(0, 2**62)):016x}",
                        "modality": ["image", "audio", "video"][int(rng.integers(0, 3))],
                        "payload": encode_fake_image(w, h, int(i)),
                        "width": w,
                        "height": h,
                        "duration_ms": int(rng.integers(0, 60_000)),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode(payload: bytes, fake_codec: bool) -> tuple[int, int, np.ndarray]:
    if payload[:8] == _MAGIC and fake_codec:
        w, h = struct.unpack("<II", payload[8:16])
        body = np.frombuffer(payload[16:], dtype=np.uint8)
        return w, h, body
    raise NotImplementedError(
        "real image decoding requires Pillow/ffmpeg — not available in "
        "this container; pass fake_codec=True for the synthetic format"
    )


def image_features(df: DataFrame, fake_codec: bool = False) -> DataFrame:
    """Decode + feature-extract per Arrow batch: (media_ref, width,
    height, mean_intensity, byte_entropy_milli).  Map-only — media
    tables shard by file, no shuffle."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                try:
                    w, h, body = _decode(bytes(payload), fake_codec)
                except (NotImplementedError, struct.error, ValueError):
                    # undecodable OR corrupt (e.g. valid magic with a
                    # truncated header) — skip the row, never the job
                    continue
                counts = np.bincount(body, minlength=256).astype(np.float64)
                p = counts[counts > 0] / len(body)
                entropy = float(-(p * np.log2(p)).sum())
                out.append(
                    {
                        "media_ref": ref,
                        "width": int(w),
                        "height": int(h),
                        "mean_intensity": float(body.mean()) if len(body) else 0.0,
                        "byte_entropy_milli": int(round(entropy * 1000)),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_ref", "width", "height", "mean_intensity",
                    "byte_entropy_milli",
                ],
            )

    return df.select("media_ref", "payload").mapInPandas(
        feats,
        schema=(
            "media_ref string, width int, height int, "
            "mean_intensity double, byte_entropy_milli long"
        ),
    )


def resize_plan(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning is pure metadata math — stays in Catalyst; only
    the pixel work (stubbed) would run in the batch kernel."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    )
    return df.select(
        "media_ref",
        "modality",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode sample timestamps
    with a sequence HOF (Catalyst-side); the decode of each frame is
    the stubbed kernel above."""
    return (
        df.where(F.col("modality") == "video")
        .select(
            "media_ref",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
