"""From-scratch minimal WAV (RIFF/PCM) codec — stdlib struct only.

Supports 16-bit little-endian PCM, mono or stereo: the shape audio
feature extraction needs (duration, RMS, peak).  Anything else
(compressed formats, 8/24/32-bit, malformed RIFF) raises
``ValueError`` and the decode kernel skips the row.

Public-knowledge format: RIFF WAVE (Microsoft/IBM, 1991).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 array → WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"unsupported sample shape {s.shape}")
    n_ch = s.shape[1]
    data = s.astype("<i2").tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
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
    if audio_fmt != 1 or bits != 16 or n_ch not in (1, 2):
        raise ValueError(f"unsupported format {audio_fmt}/{bits}bit/{n_ch}ch")
    # rate is unsigned on disk: 0 and absurd values (>10 MHz — no real
    # audio; also anything >= 2^31 would wrap negative through the
    # int32 feature schema) are malformed, skip-the-row material
    if rate == 0 or rate > 10_000_000:
        raise ValueError(f"implausible sample rate {rate}")
    if len(pcm) % (2 * n_ch):
        raise ValueError("data chunk not frame-aligned")
    arr = np.frombuffer(pcm, dtype="<i2").reshape(-1, n_ch)
    return int(rate), arr
