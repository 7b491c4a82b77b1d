"""From-scratch TIFF 6.0 subset codec — the scanned-document /
fax-archive container shape for the multimodal battery.

Supports what a scanned-invoice corpus actually carries:

- single-sample images: 8-bit grayscale and 1-bit bilevel
  (``BitsPerSample`` 8 / 1, ``SamplesPerPixel`` 1)
- both byte orders (``II`` little-endian, ``MM`` big-endian)
- ``Compression`` 1 (none) and 32773 (PackBits, per-row runs per the
  TIFF 6.0 recommendation)
- ``PhotometricInterpretation`` 0 (WhiteIsZero — the fax convention
  for bilevel) and 1 (BlackIsZero)
- multi-strip layout (``RowsPerStrip`` + StripOffsets/StripByteCounts
  arrays), bilevel rows padded to whole bytes MSB-first
  (``FillOrder`` 1)

Everything else (palettes, RGB, tiles, predictors, G3/G4, planar
configs) raises ``ValueError`` — the media kernels skip the row,
never the job (`operators/multimodal.py` contract).

Decoded output is ``(h, w, 1) uint8`` with 255 = white, matching the
other image codecs' array convention.  Mirrors the reference's scanned
-attachment handling intent (reference repo has no code —
/root/reference/README.md:1); container layout per the public TIFF 6.0
specification (Adobe, 1992).
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tags used by the subset
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279

_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


# ---------------------------------------------------------------- PackBits


def packbits_encode(row: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9) one ROW — runs never cross row
    boundaries, per the spec's 'pack each row separately' rule."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length of identical bytes at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned byte
            out.append(row[i])
            i = j
            continue
        # literal stretch: until a 3+ run starts (2-runs inside a
        # literal cost the same packed — keep the literal going)
        j = i + 1
        while j < n and j - i < 128:
            if (
                j + 2 < n
                and row[j] == row[j + 1] == row[j + 2]
            ):
                break
            j += 1
        out.append(j - i - 1)
        out.extend(row[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of ``packbits_encode`` over a strip: decode until
    ``expected`` bytes are produced; anything inconsistent raises."""
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("PackBits strip truncated")
        ctl = data[i]
        i += 1
        if ctl == 128:  # no-op
            continue
        if ctl < 128:  # literal of ctl+1 bytes
            j = i + ctl + 1
            if j > n:
                raise ValueError("PackBits literal truncated")
            out.extend(data[i:j])
            i = j
        else:  # repeat next byte 257-ctl times
            if i >= n:
                raise ValueError("PackBits repeat truncated")
            out.extend(bytes([data[i]]) * (257 - ctl))
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits output overruns the strip size")
    return bytes(out)


# ----------------------------------------------------------------- decode


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF subset → ``(h, w, 1) uint8`` (255 = white).  Raises
    ``ValueError`` on anything outside the subset or malformed."""
    if len(data) < 8:
        raise ValueError("not a TIFF: short header")
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte order")
    magic, ifd_off = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")

    def read_ifd(off: int) -> dict[int, list[int]]:
        if off + 2 > len(data):
            raise ValueError("IFD offset out of range")
        (count,) = struct.unpack(e + "H", data[off : off + 2])
        entries: dict[int, list[int]] = {}
        pos = off + 2
        if pos + 12 * count + 4 > len(data):
            raise ValueError("IFD truncated")
        for _ in range(count):
            tag, typ, cnt = struct.unpack(e + "HHI", data[pos : pos + 8])
            size = _TYPE_SIZE.get(typ)
            if size is None:
                pos += 12
                continue  # unknown value type on an unused tag — skip
            total = size * cnt
            if total <= 4:
                raw = data[pos + 8 : pos + 8 + total]
            else:
                (voff,) = struct.unpack(e + "I", data[pos + 8 : pos + 12])
                if voff + total > len(data):
                    raise ValueError("tag value out of range")
                raw = data[voff : voff + total]
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            entries[tag] = list(struct.unpack(e + fmt * cnt, raw))
            pos += 12
        return entries

    ifd = read_ifd(ifd_off)

    def one(tag: int, default: int | None = None) -> int:
        v = ifd.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"missing required tag {tag}")
            return default
        return v[0]

    w = one(_IMAGE_WIDTH)
    h = one(_IMAGE_LENGTH)
    bps = one(_BITS_PER_SAMPLE, 1)
    comp = one(_COMPRESSION, 1)
    photo = one(_PHOTOMETRIC)
    spp = one(_SAMPLES_PER_PIXEL, 1)
    if spp != 1 or bps not in (1, 8):
        raise ValueError("unsupported: only 1-bit/8-bit single-sample")
    if comp not in (1, 32773):
        raise ValueError("unsupported compression")
    if photo not in (0, 1):
        raise ValueError("unsupported photometric interpretation")
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("implausible dimensions")
    offsets = ifd.get(_STRIP_OFFSETS)
    counts = ifd.get(_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("strip tables missing or inconsistent")
    rps = one(_ROWS_PER_STRIP, h)

    row_bytes = (w + 7) // 8 if bps == 1 else w
    rows: list[bytes] = []
    for si, (soff, scnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            raise ValueError("more strips than image rows")
        if soff + scnt > len(data):
            raise ValueError("strip out of range")
        raw = data[soff : soff + scnt]
        expected = row_bytes * n_rows
        if comp == 32773:
            raw = packbits_decode(raw, expected)
        elif len(raw) != expected:
            raise ValueError("uncompressed strip size mismatch")
        rows.extend(
            raw[r * row_bytes : (r + 1) * row_bytes]
            for r in range(n_rows)
        )
    if len(rows) != h:
        raise ValueError("strip rows do not cover the image")

    buf = np.frombuffer(b"".join(rows), dtype=np.uint8)
    if bps == 1:
        bits = np.unpackbits(buf.reshape(h, row_bytes), axis=1)[:, :w]
        # photometric 0 (WhiteIsZero): bit 0 = white; 1 (BlackIsZero):
        # bit 1 = white (max value is brightest)
        white_is_one = photo == 1
        px = np.where(bits == (1 if white_is_one else 0), 255, 0)
        return px.astype(np.uint8)[..., None]
    px = buf.reshape(h, w)
    if photo == 0:  # WhiteIsZero grayscale: invert
        px = 255 - px
    return px.astype(np.uint8)[..., None]


# ----------------------------------------------------------------- encode


def encode_tiff(
    px: np.ndarray,
    bilevel: bool = False,
    compression: str = "packbits",
    byte_order: str = "II",
    rows_per_strip: int = 64,
) -> bytes:
    """``(h, w)`` / ``(h, w, 1)`` uint8 → TIFF bytes.  ``bilevel``
    thresholds at 128 and writes 1-bit rows with the fax convention
    (PhotometricInterpretation 0, WhiteIsZero); grayscale writes
    8-bit BlackIsZero.  ``compression``: ``"packbits"`` or
    ``"none"``."""
    if px.ndim == 3:
        if px.shape[2] != 1:
            raise ValueError("encode_tiff takes single-channel pixels")
        px = px[..., 0]
    if px.ndim != 2 or px.dtype != np.uint8:
        raise ValueError("encode_tiff takes (h, w) uint8")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if compression not in ("packbits", "none"):
        raise ValueError("compression must be 'packbits' or 'none'")
    e = "<" if byte_order == "II" else ">"
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if bilevel:
        # fax convention: photometric 0, bit 1 = black (pixel < 128)
        bits = (px < 128).astype(np.uint8)
        rows = [
            np.packbits(bits[r], bitorder="big").tobytes()
            for r in range(h)
        ]
        photo = 0
        bps = 1
    else:
        rows = [px[r].tobytes() for r in range(h)]
        photo = 1
        bps = 8

    rps = max(1, min(rows_per_strip, h))
    strips: list[bytes] = []
    for s0 in range(0, h, rps):
        chunk = rows[s0 : s0 + rps]
        if compression == "packbits":
            strips.append(b"".join(packbits_encode(r) for r in chunk))
        else:
            strips.append(b"".join(chunk))

    n_strips = len(strips)
    comp_val = 32773 if compression == "packbits" else 1

    # layout: header(8) | strips | [strip tables if n>1] | IFD
    pos = 8
    strip_offsets: list[int] = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = b""
    if n_strips > 1:
        off_tbl_pos = pos
        extra += struct.pack(e + "I" * n_strips, *strip_offsets)
        pos += 4 * n_strips
        cnt_tbl_pos = pos
        extra += struct.pack(e + "I" * n_strips, *(len(s) for s in strips))
        pos += 4 * n_strips
    ifd_pos = pos

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        if typ == 3 and cnt == 1:
            return struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
        return struct.pack(e + "HHII", tag, typ, cnt, val)

    entries = [
        entry(_IMAGE_WIDTH, 4, 1, w),
        entry(_IMAGE_LENGTH, 4, 1, h),
        entry(_BITS_PER_SAMPLE, 3, 1, bps),
        entry(_COMPRESSION, 3, 1, comp_val),
        entry(_PHOTOMETRIC, 3, 1, photo),
        entry(
            _STRIP_OFFSETS, 4, n_strips,
            strip_offsets[0] if n_strips == 1 else off_tbl_pos,
        ),
        entry(_SAMPLES_PER_PIXEL, 3, 1, 1),
        entry(_ROWS_PER_STRIP, 4, 1, rps),
        entry(
            _STRIP_BYTE_COUNTS, 4, n_strips,
            len(strips[0]) if n_strips == 1 else cnt_tbl_pos,
        ),
    ]
    ifd = (
        struct.pack(e + "H", len(entries))
        + b"".join(entries)
        + struct.pack(e + "I", 0)
    )
    header = byte_order.encode() + struct.pack(e + "HI", 42, ifd_pos)
    return header + b"".join(strips) + extra + ifd
