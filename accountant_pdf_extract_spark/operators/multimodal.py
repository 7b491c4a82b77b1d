"""Multimodal column handling for training-data pipelines: media
payloads as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.

Codecs are REAL and from-scratch (no Pillow/ffmpeg in the container,
none needed): images/posters are minimal 8-bit PNGs
(``functions/png.py`` — zlib IDAT, 5 scanline filters, CRC-checked)
and audio is RIFF/PCM WAV (``functions/wav.py``).  Only full video
container demux remains out of scope — video rows carry a PNG poster
frame plus duration metadata, and ``frame_sample_plan`` plans frame
timestamps Catalyst-side.

Scale shape: media tables shard by file; decode/feature kernels are
map-only ``mapInPandas`` (no shuffle), so the plan scales linearly
with executors.  Corrupt/unsupported payloads skip the ROW, never the
job.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from accountant_pdf_extract_spark.functions.jpeg import decode_jpeg, encode_jpeg
from accountant_pdf_extract_spark.functions.png import (
    PNG_SIG,
    decode_png,
    encode_png,
    encode_png_palette,
)
from accountant_pdf_extract_spark.functions.tiff import decode_tiff, encode_tiff
from accountant_pdf_extract_spark.functions.wav import decode_wav, encode_wav

# media table schema: (media_ref string, modality string, payload binary,
#                      width int, height int, duration_ms int)
MEDIA_SCHEMA = (
    "media_ref string, modality string, payload binary, "
    "width int, height int, duration_ms int"
)


def _synth_pixels(w: int, h: int, seed: int) -> np.ndarray:
    """Deterministic structured pixels (gradient + seeded noise) —
    compresses well, so big synthetic dims stay small on disk."""
    rng = np.random.default_rng(seed)
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    base = np.stack(
        [gx + 0 * gy, 0 * gx + gy, (gx + gy) / 2], axis=2
    )
    noise = rng.integers(-16, 17, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _synth_samples(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    freq = float(rng.uniform(0.01, 0.2))
    tone = np.sin(t * freq) * float(rng.uniform(2000, 16000))
    return (tone + rng.integers(-500, 501, size=n)).astype(np.int16)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Synthetic media table (deterministic): image and video rows
    carry a real PNG payload (the video one is its poster frame) at
    exactly (width, height); audio rows carry a real 16-bit PCM WAV
    whose length matches ``duration_ms`` (capped at 1 s of samples)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng([seed, int(i)])
                w = int(rng.integers(16, 512))
                h = int(rng.integers(16, 512))
                modality = ["image", "audio", "video"][int(rng.integers(0, 3))]
                duration = int(rng.integers(0, 60_000))
                if modality == "audio":
                    rate = 8000
                    n_samp = max(1, min(rate, duration * rate // 1000))
                    # rotate encodings: 16-bit PCM, G.711 μ-law (the
                    # telephony shape), 8-bit PCM (dictaphone)
                    payload = encode_wav(
                        _synth_samples(n_samp, int(i)), sample_rate=rate,
                        fmt=["pcm16", "mulaw", "pcm16", "pcm8"][
                            int(i) % 4
                        ],
                    )
                else:
                    # rotate formats so every decode path runs in every
                    # corpus: PNG filter 0, PNG filter 2 (the two
                    # vectorized paths), baseline 4:2:0 JPEG,
                    # progressive (SOF2) JPEG, PackBits grayscale TIFF,
                    # big-endian bilevel TIFF, CCITT Group 4 TIFF (the
                    # scanned-fax shapes), Adobe YCCK CMYK JPEG (the
                    # print-workflow shape) and 4-bit palette PNG
                    # (the web PNG8 shape) — the web-sourced mix
                    fmt = int(i) % 9
                    if fmt == 8:
                        px3 = _synth_pixels(w, h, int(i))
                        # 16-color palette: quantize the synth RGB to
                        # 4-bit indices deterministically
                        pal = np.stack(
                            [np.arange(16) * 17] * 3, axis=1
                        ).astype(np.uint8)
                        idx = (
                            px3.mean(axis=2) / 16.0
                        ).astype(np.uint8).clip(0, 15)
                        payload = encode_png_palette(
                            idx, pal, depth=4,
                            trns=(
                                np.arange(16, dtype=np.uint8) * 16
                                if int(i) % 18 == 8
                                else None
                            ),
                            filter_type=int(i) % 3,
                        )
                    elif fmt == 7:
                        px3 = _synth_pixels(w, h, int(i)).astype(np.float64)
                        # derive smooth ink values from the RGB synth
                        # (K from darkness, CMY from the channels)
                        k = 255.0 - px3.max(axis=2, keepdims=True)
                        cmyk = np.concatenate(
                            [255.0 - px3, k], axis=2
                        ) * (1.0 - k / 255.0 / 2.0)
                        payload = encode_jpeg(
                            np.clip(np.rint(cmyk), 0, 255).astype(
                                np.uint8
                            ),
                            adobe_transform=2 if int(i) % 16 < 8 else 0,
                        )
                    elif fmt == 6:
                        payload = encode_tiff(
                            _synth_pixels(w, h, int(i))[..., 0],
                            bilevel=True,
                            compression="g4",
                        )
                    elif fmt == 4:
                        payload = encode_tiff(
                            _synth_pixels(w, h, int(i))[..., 0],
                            compression="packbits",
                        )
                    elif fmt == 5:
                        payload = encode_tiff(
                            _synth_pixels(w, h, int(i))[..., 0],
                            bilevel=True,
                            compression="none",
                            byte_order="MM",
                        )
                    elif fmt == 2:
                        # phone-camera shape: some JPEGs carry an Exif
                        # orientation the decoder must honor (180° —
                        # dim-preserving — keeps the row's declared
                        # width/height metadata truthful)
                        pix = _synth_pixels(w, h, int(i))
                        o3 = int(i) % 11 == 2
                        payload = encode_jpeg(
                            pix[::-1, ::-1] if o3 else pix,
                            subsampling="420",
                            # some JPEGs carry restart markers
                            restart_interval=4 if int(i) % 6 == 5 else 0,
                            exif_orientation=3 if o3 else None,
                        )
                    elif fmt == 3:
                        payload = encode_jpeg(
                            _synth_pixels(w, h, int(i)),
                            subsampling="420" if int(i) % 8 == 3 else "444",
                            progressive=True,
                        )
                    else:
                        # ~1/5 of direct-color PNGs are Adam7
                        # interlaced (the legacy web shape)
                        payload = encode_png(
                            _synth_pixels(w, h, int(i)),
                            filter_type=[0, 2][fmt],
                            interlace=int(i) % 10 == 1,
                        )
                rows.append(
                    {
                        "media_ref": f"media://sha/{int(rng.integers(0, 2**62)):016x}",
                        "modality": modality,
                        "payload": payload,
                        "width": w,
                        "height": h,
                        "duration_ms": duration,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(data: bytes) -> np.ndarray:
    """Magic-sniffing image decode: PNG, JPEG (baseline or progressive
    DCTDecode) or TIFF (the scanned-fax container: gray/bilevel,
    PackBits, CCITT G4) → (h, w, c) uint8.  Anything else raises
    ValueError
    (the kernels skip the row)."""
    if data[:8] == PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    if data[:2] in (b"II", b"MM"):
        return decode_tiff(data)
    raise ValueError("unsupported image format")


def _decoded_rows(decoder, row_fn, columns):
    """Shared mapInPandas skeleton for the media kernels: iterate the
    Arrow batch, skip NULL payloads, decode with skip-the-row fault
    isolation (codec errors normalize to ValueError; struct.error
    covers header unpacks), emit fixed columns.  The skip semantics
    live HERE once — a fix applies to every media kernel at once
    instead of three copy-pasted loops."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    decoded = decoder(bytes(payload))
                except (ValueError, struct.error):
                    continue
                out.append(row_fn(ref, payload, decoded))
            yield pd.DataFrame(out, columns=columns)

    return fn


def image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract per Arrow batch: (media_ref, width,
    height, mean_intensity, byte_entropy_milli).  Decodes every row
    whose payload is a supported PNG (image rows and video poster
    frames); corrupt or non-image payloads skip the row, never the
    job.  Map-only — no shuffle."""

    def row(ref, _payload, px):
        h, w, _c = px.shape
        body = px.reshape(-1)
        counts = np.bincount(body, minlength=256).astype(np.float64)
        p = counts[counts > 0] / len(body)
        entropy = float(-(p * np.log2(p)).sum())
        return {
            "media_ref": ref,
            "width": int(w),
            "height": int(h),
            "mean_intensity": float(body.mean()) if len(body) else 0.0,
            "byte_entropy_milli": int(round(entropy * 1000)),
        }

    return df.select("media_ref", "payload").mapInPandas(
        _decoded_rows(decode_image, row, [
            "media_ref", "width", "height", "mean_intensity",
            "byte_entropy_milli",
        ]),
        schema=(
            "media_ref string, width int, height int, "
            "mean_intensity double, byte_entropy_milli long"
        ),
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Decode WAV rows per Arrow batch: (media_ref, sample_rate,
    n_samples, pcm_ms, rms_milli, peak).  Non-WAV/corrupt payloads
    skip the row.  Map-only — no shuffle."""

    def row(ref, _payload, decoded):
        rate, samples = decoded
        x = samples.astype(np.float64)
        rms = float(np.sqrt((x**2).mean())) if x.size else 0.0
        return {
            "media_ref": ref,
            "sample_rate": int(rate),
            "n_samples": int(samples.shape[0]),
            "pcm_ms": int(samples.shape[0] * 1000 // rate),
            "rms_milli": int(round(rms * 1000)),
            "peak": int(np.abs(samples.astype(np.int32)).max())
            if x.size else 0,
        }

    return df.select("media_ref", "payload").mapInPandas(
        _decoded_rows(decode_wav, row, [
            "media_ref", "sample_rate", "n_samples", "pcm_ms",
            "rms_milli", "peak",
        ]),
        schema=(
            "media_ref string, sample_rate int, n_samples long, "
            "pcm_ms long, rms_milli long, peak int"
        ),
    )


def resize_plan(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning is pure metadata math — stays in Catalyst; the
    pixel resample itself is ``resize_image`` in the batch kernel."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    )
    # greatest(1, ...): extreme aspect ratios must never plan a
    # zero-pixel side (the resize kernel clamps identically)
    return df.select(
        "media_ref",
        "modality",
        "width",
        "height",
        F.greatest(F.lit(1), F.round(F.col("width") * scale).cast("int")).alias(
            "target_w"
        ),
        F.greatest(
            F.lit(1), F.round(F.col("height") * scale).cast("int")
        ).alias("target_h"),
    )


def resize_images(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Nearest-neighbour resize of PNG/JPEG payloads to fit
    ``max_side``, re-encoded in the source format: (media_ref,
    payload, width, height).  Aspect preserved; rows already small
    enough pass through unchanged; unsupported payloads skip."""

    def row(ref, payload, px):
        h, w, _c = px.shape
        scale = min(1.0, max_side / max(w, h))
        # HALF_UP like resize_plan's F.round (Python round() is
        # banker's: round(4.5)=4 would diverge from the plan)
        tw = max(1, int(np.floor(w * scale + 0.5)))
        th = max(1, int(np.floor(h * scale + 0.5)))
        if (tw, th) == (w, h):
            # already in budget: pass the ORIGINAL bytes through
            # (no re-encode churn — byte-identical payloads keep
            # downstream byte-level dedup/caching effective)
            new_payload = bytes(payload)
        else:
            ys = (np.arange(th) * (h / th)).astype(np.int64)
            xs = (np.arange(tw) * (w / tw)).astype(np.int64)
            small = px[ys][:, xs]
            # re-encode in the SOURCE container so a mixed
            # PNG/JPEG/TIFF table keeps its formats through the
            # thumbnail pass
            head = bytes(payload[:2])
            if head == b"\xff\xd8":
                new_payload = encode_jpeg(small, subsampling="420")
            elif head in (b"II", b"MM"):
                new_payload = encode_tiff(
                    small[..., 0],
                    byte_order=head.decode(),
                )
            else:
                new_payload = encode_png(small)
        return {
            "media_ref": ref,
            "payload": new_payload,
            "width": tw,
            "height": th,
        }

    return df.select("media_ref", "payload").mapInPandas(
        _decoded_rows(decode_image, row,
                      ["media_ref", "payload", "width", "height"]),
        schema="media_ref string, payload binary, width int, height int",
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode sample timestamps
    with a sequence HOF (Catalyst-side); real frame decode would demux
    the container — out of scope, the poster frame stands in."""
    if every_ms <= 0:
        # sequence(step=0) only fails at ACTION time with a whole-job
        # SparkRuntimeException — fail fast at plan build instead
        raise ValueError(f"every_ms must be positive, got {every_ms}")
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
