"""From-scratch minimal PNG codec (no Pillow — stdlib zlib only).

Supports the subset a training-data thumbnail pipeline needs:
greyscale (color type 0), RGB (2), grey+alpha (4), RGBA (6) at bit
depth 8 or 16 (16-bit samples reduce to their high byte on decode —
the standard 8-bit view) and palette (3, the web PNG8 shape — bit
depths 1/2/4/8, PLTE + optional tRNS alpha, expanded to RGB/RGBA on
decode), both interlace methods (0 = none, 1 = Adam7 — the seven
passes defilter independently and scatter into place), all five
scanline filters (None/Sub/Up/Average/Paeth) on both encode and
decode, multiple IDAT chunks, CRC validation.  Anything else raises
``ValueError`` — the decode kernels treat that as a
corrupt/unsupported payload and skip the row.

Perf shape: filters None/Sub/Up decode fully vectorized (Sub is a
cumsum mod 256 along the row); Average/Paeth fall back to a per-pixel
loop — fine for the small unit images that exercise them, and the
synthetic corpus encodes with filter 0/2 which stay on the fast path.

Public-knowledge format: PNG spec (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}

# Decode refuses images above this pixel count (64 Mpx ≈ 200 MB RGB):
# `expected` derives from the attacker-controlled IHDR, so without a
# cap a crafted huge-dims header plus a high-ratio zlib stream would
# still inflate gigabytes before the size check (bomb defense #2).
# Bomb defense is budgeted in COMPONENTS (w*h*channels), because the
# decode path holds ~5 bytes per component at peak (raw scanlines +
# two int16 working copies): 2^26 components ~= 320 MB peak per
# payload — x32 concurrent local tasks ~= 10 GB, inside the heap.  A
# pixel-count cap alone under-counted RGBA 6x and the documented
# defense did not hold.
MAX_COMPONENTS = 1 << 26

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per PNG §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _defilter_pass(
    arr: np.ndarray, h: int, stride: int, bpp: int
) -> np.ndarray:
    """One (sub-)image's scanlines (h, stride+1 with leading filter
    bytes) → reconstructed (h, stride) uint8.  Filters reference only
    rows of the SAME pass (PNG §9: each interlace pass filters
    independently)."""
    ftypes = arr[:, 0]
    if (ftypes > 4).any():
        raise ValueError("bad scanline filter byte")
    filt = arr[:, 1:].astype(np.int16)
    recon = np.zeros((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        ft = int(ftypes[r])
        row = filt[r]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:  # Sub: cumsum mod 256 per channel phase
            # int64: cumsum > int16; (stride//bpp, bpp) == (w, c) for
            # direct-color rows, (row_bytes, 1) for packed palette rows
            acc = row.astype(np.int64).reshape(stride // bpp, bpp)
            np.cumsum(acc, axis=0, out=acc)
            rec = (acc % 256).astype(np.int16).reshape(stride)
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft == 3:  # Average — left-sequential
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + (left + prev[x]) // 2) % 256
        else:  # Paeth — left-sequential
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (row[x] + pred) % 256
        recon[r] = rec
        prev = rec
    return recon.astype(np.uint8)


def _unpack_indices(
    rec: np.ndarray, w: int, depth: int
) -> np.ndarray:
    """Packed palette rows (h, row_bytes) → (h, w) uint8 indices
    (MSB-first sub-byte packing)."""
    if depth == 8:
        return rec[:, :w]
    h, rb = rec.shape
    bits = np.unpackbits(rec, axis=1)
    per = 8 // depth
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (
        bits[:, : rb * 8]
        .reshape(h, rb * per, depth)
        .dot(weights)
        .astype(np.uint8)[:, :w]
    )


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise over int16+ arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _filter_rows(flat: np.ndarray, bpp: int, filter_type: int) -> np.ndarray:
    """Apply one scanline filter to a pass's rows ((h, stride) int16
    → (h, stride) uint8).  Filter references stay inside the pass."""
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, bpp:] = flat[:-1, :-bpp]
    if filter_type == 0:
        filt = flat
    elif filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - up
    elif filter_type == 3:
        filt = flat - (left + up) // 2
    else:
        filt = flat - _paeth(left, up, ul)
    return (filt % 256).astype(np.uint8)


def _emit_rows(raw: bytearray, filt: np.ndarray, filter_type: int) -> None:
    for r in range(filt.shape[0]):
        raw.append(filter_type)
        raw += filt[r].tobytes()


def encode_png(
    pixels: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """8-bit PNG bytes from a (h, w) grey or (h, w, 3|4) uint8 array,
    every scanline filtered with ``filter_type`` (0..4);
    ``interlace=True`` emits Adam7 (each pass filtered
    independently)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _CHANNELS_COLOR:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter {filter_type}")
    h, w, c = px.shape
    if h == 0 or w == 0:
        # a zero-dim PNG is an artifact our own decoder (and the spec)
        # rejects — refuse to emit it rather than producing bytes the
        # pipeline later classifies as corrupt
        raise ValueError(f"empty image dimensions {w}x{h}")
    bpp = c  # bytes per pixel at bit depth 8

    raw = bytearray()
    grid = _ADAM7 if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in grid:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue  # empty pass contributes no bytes
        flat = sub.reshape(ph, pw * c).astype(np.int16)
        _emit_rows(raw, _filter_rows(flat, bpp, filter_type), filter_type)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, _CHANNELS_COLOR[c], 0, 0, int(interlace)
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _pack_indices(idx: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) indices → (h, row_bytes) MSB-first packed rows."""
    if depth == 8:
        return idx
    h, w = idx.shape
    per = 8 // depth
    padded = np.pad(idx, ((0, 0), (0, -w % per)))
    bits = (
        (padded[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(h, -1), axis=1)


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    depth: int = 8,
    filter_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """Indexed PNG (color type 3): ``indices`` (h, w) uint8 into
    ``palette`` (N, 3) uint8; ``trns`` (M,) uint8 alpha entries (M ≤
    N) emits a tRNS chunk; ``depth`` 1/2/4/8 packs indices MSB-first.
    Filters apply byte-wise over the packed rows (bpp = 1);
    ``interlace=True`` emits Adam7 with per-pass packing."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("indices must be (h, w), palette (N, 3)")
    if not 1 <= len(pal) <= 256 or depth not in (1, 2, 4, 8):
        raise ValueError("bad palette size or depth")
    if (idx >= min(len(pal), 1 << depth)).any():
        raise ValueError("index outside palette/depth range")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter {filter_type}")
    h, w = idx.shape
    if h == 0 or w == 0:
        raise ValueError(f"empty image dimensions {w}x{h}")

    raw = bytearray()
    grid = _ADAM7 if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in grid:
        sub = idx[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        flat = _pack_indices(sub, depth).astype(np.int16)
        _emit_rows(raw, _filter_rows(flat, 1, filter_type), filter_type)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, int(interlace))
    out = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        t = np.asarray(trns, dtype=np.uint8)
        if t.ndim != 1 or len(t) > len(pal):
            raise ValueError("tRNS longer than palette")
        out += _chunk(b"tRNS", t.tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array.  Raises ``ValueError``
    on anything outside the supported subset or any corruption (bad
    signature/CRC/length, truncation, bad filter byte)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if len(ihdr) != 13:
        raise ValueError("bad IHDR length")  # ValueError, not struct.error
    w, h, depth, color, comp, filt_method, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if color == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"unsupported palette depth {depth}")
        if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError("missing or malformed PLTE")
    elif depth not in (8, 16) or color not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported depth/color {depth}/{color}")
    # 16-bit samples reduce to their HIGH byte (the standard 16→8
    # view); samples are big-endian per PNG §7.1
    sb = 2 if (depth == 16 and color != 3) else 1
    if comp != 0 or filt_method != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace not in (0, 1):
        raise ValueError("unknown interlace method")
    c = 3 if color == 3 else _COLOR_CHANNELS[color]
    if w <= 0 or h <= 0 or w * h * c * sb > MAX_COMPONENTS:
        raise ValueError(f"image dimensions {w}x{h} out of range")
    # filters operate on BYTES: for palette rows (possibly sub-byte
    # packed) the spec's bpp rounds up to one byte; 16-bit samples
    # double it
    bpp = 1 if color == 3 else c * sb
    grid = ((0, 0, 1, 1),) if interlace == 0 else _ADAM7
    spans = []  # (x0, y0, dx, dy, pw, ph, row_bytes)
    expected = 0
    for x0, y0, dx, dy in grid:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass: contributes NO bytes (PNG §8.2)
        rb = (pw * depth + 7) // 8 if color == 3 else pw * c * sb
        spans.append((x0, y0, dx, dy, pw, ph, rb))
        expected += ph * (rb + 1)
    # bounded inflate: dims are known BEFORE decompression, so a
    # crafted decompression bomb (tiny zlib stream expanding to GBs)
    # stops at expected+1 bytes instead of OOMing the executor
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from e
    # post-eof garbage lands in unused_data (unconsumed_tail is only
    # populated by the max_length bound, which len(raw) covers)
    if len(raw) != expected or d.unused_data:
        raise ValueError("IDAT size does not match dimensions")

    full = np.zeros((h, w) if color == 3 else (h, w, c), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph, rb in spans:
        arr = np.frombuffer(
            raw[off : off + ph * (rb + 1)], dtype=np.uint8
        ).reshape(ph, rb + 1)
        off += ph * (rb + 1)
        rec = _defilter_pass(arr, ph, rb, bpp)
        if color == 3:
            full[y0::dy, x0::dx] = _unpack_indices(rec, pw, depth)
        elif sb == 2:  # 16-bit big-endian → high byte
            full[y0::dy, x0::dx] = rec.reshape(ph, pw, c, 2)[..., 0]
        else:
            full[y0::dy, x0::dx] = rec.reshape(ph, pw, c)
    if color != 3:
        return full
    # palette expansion: look up PLTE; a tRNS chunk adds per-entry
    # alpha (absent entries fully opaque) and upgrades to RGBA
    idx = full
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    if (idx >= len(pal)).any():
        raise ValueError("palette index out of range")
    rgb = pal[idx]
    if trns is None:
        return rgb
    alpha = np.full(len(pal), 255, dtype=np.uint8)
    n = min(len(trns), len(pal))
    alpha[:n] = np.frombuffer(trns[:n], dtype=np.uint8)
    return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
