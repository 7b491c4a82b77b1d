"""From-scratch minimal WAV (RIFF) codec — stdlib struct + numpy.

Supports the voice-archive shapes audio feature extraction needs
(duration, RMS, peak), mono or stereo: 16-bit little-endian PCM
(format 1), 8-bit unsigned PCM (format 1 — the dictaphone shape),
and G.711 μ-law (format 7 — the telephony shape); 8-bit and μ-law
expand to int16 on decode.  Anything else (ADPCM, float, 24/32-bit,
malformed RIFF) raises ``ValueError`` and the decode kernel skips
the row.

Public-knowledge formats: RIFF WAVE (Microsoft/IBM, 1991) and ITU-T
G.711 (μ-law companding).
"""

from __future__ import annotations

import struct

import numpy as np

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def _mulaw_decode_table() -> np.ndarray:
    """256-entry μ-law byte → int16 expansion (G.711)."""
    codes = np.arange(256, dtype=np.int32)
    u = ~codes & 0xFF
    t = ((u & 0x0F) << 3) + _MULAW_BIAS
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _MULAW_BIAS - t, t - _MULAW_BIAS).astype(
        np.int16
    )


_MULAW_DEC = _mulaw_decode_table()


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear → μ-law bytes (G.711 compression)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, fmt: str = "pcm16"
) -> bytes:
    """(n,) or (n, channels) int16 array → WAV bytes.  ``fmt``:
    ``"pcm16"`` (format 1, 16-bit), ``"pcm8"`` (format 1, 8-bit
    unsigned — high byte kept) or ``"mulaw"`` (format 7, G.711)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"unsupported sample shape {s.shape}")
    n_ch = s.shape[1]
    if fmt == "pcm16":
        audio_fmt, width = 1, 2
        data = s.astype("<i2").tobytes()
    elif fmt == "pcm8":
        audio_fmt, width = 1, 1
        data = (
            ((s.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        )
    elif fmt == "mulaw":
        audio_fmt, width = 7, 1
        data = mulaw_encode(s).tobytes()
    else:
        raise ValueError("fmt must be 'pcm16', 'pcm8' or 'mulaw'")
    byte_rate = sample_rate * n_ch * width
    fmt_body = struct.pack(
        "<HHIIHH", audio_fmt, n_ch, sample_rate, byte_rate,
        n_ch * width, width * 8,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, (n, channels) int16 array)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF body")
    pos = 12
    fmt = None
    pcm = None
    # walk only the declared RIFF body — trailing bytes after it (ID3
    # tags, tool padding) are NOT chunks; scanning to len(data) turned
    # such tails into bogus "truncated chunk" errors (dropping valid
    # rows) or, worse, let a stray fmt/data tag override the real ones
    end = min(len(data), 8 + riff_len)
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated fmt chunk")  # ValueError, not struct.error
    audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    supported = (
        (audio_fmt == 1 and bits in (8, 16))
        or (audio_fmt == 7 and bits == 8)
    )
    if not supported or n_ch not in (1, 2):
        raise ValueError(f"unsupported format {audio_fmt}/{bits}bit/{n_ch}ch")
    # rate is unsigned on disk: 0 and absurd values (>10 MHz — no real
    # audio; also anything >= 2^31 would wrap negative through the
    # int32 feature schema) are malformed, skip-the-row material
    if rate == 0 or rate > 10_000_000:
        raise ValueError(f"implausible sample rate {rate}")
    width = bits // 8
    if len(pcm) % (width * n_ch):
        raise ValueError("data chunk not frame-aligned")
    if audio_fmt == 7:  # G.711 μ-law → int16
        arr = _MULAW_DEC[np.frombuffer(pcm, dtype=np.uint8)].reshape(
            -1, n_ch
        )
    elif bits == 8:  # unsigned 8-bit PCM → int16
        arr = (
            (np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128)
            << 8
        ).reshape(-1, n_ch)
    else:
        arr = np.frombuffer(pcm, dtype="<i2").reshape(-1, n_ch)
    return int(rate), arr
