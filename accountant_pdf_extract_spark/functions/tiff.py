"""From-scratch TIFF 6.0 subset codec — the scanned-document /
fax-archive container shape for the multimodal battery.

Supports what a scanned-invoice corpus actually carries:

- single-sample images: 8-bit grayscale and 1-bit bilevel
  (``BitsPerSample`` 8 / 1, ``SamplesPerPixel`` 1)
- both byte orders (``II`` little-endian, ``MM`` big-endian)
- ``Compression`` 1 (none), 32773 (PackBits, per-row runs per the
  TIFF 6.0 recommendation) and 4 (CCITT Group 4 / ITU-T T.6 2D
  coding — THE fax-scanner bilevel compression; full vertical /
  horizontal / pass mode codec with the T.4 MH run-length tables,
  implemented from the public ITU-T T.4/T.6 specifications; strips
  are independently coded, first reference line all white, no
  EOL/EOFB per the TIFF convention)
- ``PhotometricInterpretation`` 0 (WhiteIsZero — the fax convention
  for bilevel) and 1 (BlackIsZero); G4 requires photometric 0
- multi-strip layout (``RowsPerStrip`` + StripOffsets/StripByteCounts
  arrays), bilevel rows padded to whole bytes MSB-first
  (``FillOrder`` 1)

Everything else (palettes, RGB, tiles, predictors, G3/1D, planar
configs) raises ``ValueError`` — the media kernels skip the row,
never the job (`operators/multimodal.py` contract).

Decoded output is ``(h, w, 1) uint8`` with 255 = white, matching the
other image codecs' array convention.  Mirrors the reference's scanned
-attachment handling intent (reference repo has no code —
/root/reference/README.md:1); container layout per the public TIFF 6.0
specification (Adobe, 1992).
"""

from __future__ import annotations

import bisect
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


# ------------------------------------------------- CCITT Group 4 (T.6)
#
# 2D line-by-line coding against the previous row's changing elements
# (ITU-T T.6 §2; run-length codes from T.4 §4.1 tables 2-4).  Bits are
# MSB-first; 1 = black (photometric 0 / WhiteIsZero fax convention).

# terminating codes, run 0-63 (T.4 table 2)
_TERM_W = (
    "00110101 000111 0111 1000 1011 1100 1110 1111 10011 10100 00111"
    " 01000 001000 000011 110100 110101 101010 101011 0100111 0001100"
    " 0001000 0010111 0000011 0000100 0101000 0101011 0010011 0100100"
    " 0011000 00000010 00000011 00011010 00011011 00010010 00010011"
    " 00010100 00010101 00010110 00010111 00101000 00101001 00101010"
    " 00101011 00101100 00101101 00000100 00000101 00001010 00001011"
    " 01010010 01010011 01010100 01010101 00100100 00100101 01011000"
    " 01011001 01011010 01011011 01001010 01001011 00110010 00110011"
    " 00110100"
).split()
_TERM_B = (
    "0000110111 010 11 10 011 0011 0010 00011 000101 000100 0000100"
    " 0000101 0000111 00000100 00000111 000011000 0000010111 0000011000"
    " 0000001000 00001100111 00001101000 00001101100 00000110111"
    " 00000101000 00000010111 00000011000 000011001010 000011001011"
    " 000011001100 000011001101 000001101000 000001101001 000001101010"
    " 000001101011 000011010010 000011010011 000011010100 000011010101"
    " 000011010110 000011010111 000001101100 000001101101 000011011010"
    " 000011011011 000001010100 000001010101 000001010110 000001010111"
    " 000001100100 000001100101 000001010010 000001010011 000000100100"
    " 000000110111 000000111000 000000100111 000000101000 000001011000"
    " 000001011001 000000101011 000000101100 000001011010 000001100110"
    " 000001100111"
).split()
# makeup codes, run 64-1728 step 64 (T.4 table 3)
_MAKEUP_W = (
    "11011 10010 010111 0110111 00110110 00110111 01100100 01100101"
    " 01101000 01100111 011001100 011001101 011010010 011010011"
    " 011010100 011010101 011010110 011010111 011011000 011011001"
    " 011011010 011011011 010011000 010011001 010011010 011000"
    " 010011011"
).split()
_MAKEUP_B = (
    "0000001111 000011001000 000011001001 000001011011 000000110011"
    " 000000110100 000000110101 0000001101100 0000001101101"
    " 0000001001010 0000001001011 0000001001100 0000001001101"
    " 0000001110010 0000001110011 0000001110100 0000001110101"
    " 0000001110110 0000001110111 0000001010010 0000001010011"
    " 0000001010100 0000001010101 0000001011010 0000001011011"
    " 0000001100100 0000001100101"
).split()
# extended makeup codes, run 1792-2560 step 64, shared (T.4 table 4)
_MAKEUP_EXT = (
    "00000001000 00000001100 00000001101 000000010010 000000010011"
    " 000000010100 000000010101 000000010110 000000010111 000000011100"
    " 000000011101 000000011110 000000011111"
).split()

_ENC_RUN = (  # color -> run -> bits (terminating + makeups merged)
    {r: c for r, c in enumerate(_TERM_W)}
    | {64 * (k + 1): c for k, c in enumerate(_MAKEUP_W)}
    | {1792 + 64 * k: c for k, c in enumerate(_MAKEUP_EXT)},
    {r: c for r, c in enumerate(_TERM_B)}
    | {64 * (k + 1): c for k, c in enumerate(_MAKEUP_B)}
    | {1792 + 64 * k: c for k, c in enumerate(_MAKEUP_EXT)},
)
_DEC_RUN = tuple({c: r for r, c in tbl.items()} for tbl in _ENC_RUN)
_RUN_MAXLEN = max(len(c) for tbl in _DEC_RUN for c in tbl)

_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011",
           -2: "000010", 3: "0000011", -3: "0000010"}
_MODE_H = "001"
_MODE_P = "0001"
_DEC_MODE: dict[str, tuple[str, int]] = (
    {c: ("v", d) for d, c in _MODE_V.items()}
    | {_MODE_H: ("h", 0), _MODE_P: ("p", 0),
       "000000000001": ("eol", 0)}
)
_MODE_MAXLEN = max(len(c) for c in _DEC_MODE)


def _transitions(row: np.ndarray) -> list[int]:
    """Changing-element positions of one 0/1 row (imaginary white
    pixel before position 0, per T.6 §2.2.2): index parity encodes
    the color — even = into black, odd = into white."""
    padded = np.empty(len(row) + 1, np.int8)
    padded[0] = 0
    padded[1:] = row
    return np.flatnonzero(np.diff(padded)).tolist()


def _next_changing(trans: list[int], pos: int, parity: int, w: int):
    """First element of ``trans`` strictly right of ``pos`` whose
    index parity is ``parity`` → (value, index); (w, len) sentinel
    when none (the imaginary changing element at line end)."""
    i = bisect.bisect_right(trans, pos)
    if i < len(trans) and i % 2 != parity:
        i += 1
    return (trans[i], i) if i < len(trans) else (w, len(trans))


def _run_bits(color: int, run: int) -> str:
    """MH code for one run: zero or more makeup codes then exactly
    one terminating code of the same color (T.4 §4.1.3)."""
    tbl = _ENC_RUN[color]
    out = []
    while run >= 64:
        chunk = min(run - run % 64, 2560)
        out.append(tbl[chunk])
        run -= chunk
    out.append(tbl[run])
    return "".join(out)


def g4_encode(bits: np.ndarray) -> bytes:
    """``(h, w)`` uint8 array of 0/1 (1 = black) → T.6 coded bytes.
    Rows are coded against the previous row (first reference line all
    white); no EOL/EOFB, zero-padded to a byte (TIFF convention)."""
    h, w = bits.shape
    out: list[str] = []
    ref: list[int] = []
    for r in range(h):
        cur = _transitions(bits[r])
        a0, color = -1, 0
        while a0 < w:
            a1, _ = _next_changing(cur, a0, color, w)
            b1, j = _next_changing(ref, a0, color, w)
            b2 = ref[j + 1] if j + 1 < len(ref) else w
            if b2 < a1:
                out.append(_MODE_P)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                out.append(_MODE_V[a1 - b1])
                a0, color = a1, color ^ 1
            else:
                k = cur.index(a1) + 1 if a1 < w else len(cur)
                a2 = cur[k] if k < len(cur) else w
                r1 = a1 - (0 if a0 < 0 else a0)
                out.append(_MODE_H)
                out.append(_run_bits(color, r1))
                out.append(_run_bits(color ^ 1, a2 - a1))
                a0 = a2
        ref = cur
    s = "".join(out)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


class _Bits:
    """MSB-first bit reader over a strip payload."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("G4 data truncated")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit


def _read_code(br: _Bits, table: dict[str, object], maxlen: int):
    s = ""
    for _ in range(maxlen):
        s += "01"[br.read()]
        v = table.get(s)
        if v is not None:
            return v
    raise ValueError("bad G4 code")


def _read_run(br: _Bits, color: int) -> int:
    total = 0
    while True:
        v = _read_code(br, _DEC_RUN[color], _RUN_MAXLEN)
        total += v
        if v < 64:
            return total


def g4_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """T.6 coded strip → ``(h, w)`` uint8 of 0/1 (1 = black).
    Raises ``ValueError`` on truncation, bad codes, or coordinates
    that leave the line (the skip-the-row codec contract)."""
    br = _Bits(data)
    rows = np.zeros((h, w), np.uint8)
    ref: list[int] = []
    for r in range(h):
        cur: list[int] = []
        a0, color = -1, 0
        guard = 2 * w + 8  # belt-and-suspenders vs non-advancing loops
        while a0 < w:
            guard -= 1
            if guard < 0:
                raise ValueError("G4 row does not terminate")
            b1, j = _next_changing(ref, a0, color, w)
            b2 = ref[j + 1] if j + 1 < len(ref) else w
            mode, d = _read_code(br, _DEC_MODE, _MODE_MAXLEN)
            if mode == "p":
                a0 = b2
            elif mode == "v":
                a1 = b1 + d
                if a1 <= a0 or a1 > w or a1 < 0:
                    raise ValueError("G4 vertical mode leaves the line")
                cur.append(a1)
                a0, color = a1, color ^ 1
            elif mode == "h":
                base = 0 if a0 < 0 else a0
                a1 = base + _read_run(br, color)
                a2 = a1 + _read_run(br, color ^ 1)
                if a2 > w or (a2 == a1 and a1 < w):
                    raise ValueError("G4 horizontal run leaves the line")
                cur.extend((a1, a2))
                a0 = a2
            else:  # EOL/EOFB inside a TIFF G4 strip body
                raise ValueError("unexpected EOL in G4 strip")
        for k in range(0, len(cur), 2):
            start = cur[k]
            end = cur[k + 1] if k + 1 < len(cur) else w
            rows[r, start:min(end, w)] = 1
        ref = [t for t in cur if t < w]
    return rows


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
    if comp not in (1, 32773, 4):
        raise ValueError("unsupported compression")
    if comp == 4 and (bps != 1 or photo != 0):
        # G4 is defined over the fax convention (bilevel, WhiteIsZero)
        raise ValueError("G4 requires 1-bit WhiteIsZero")
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
        elif comp == 4:
            # strips are independent T.6 blocks (first reference line
            # all white each) — repack to the MSB-first row-byte shape
            # the shared bit-expansion below consumes
            raw = np.packbits(
                g4_decode(raw, w, n_rows), axis=1
            ).tobytes()
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
    8-bit BlackIsZero.  ``compression``: ``"packbits"``, ``"none"``
    or ``"g4"`` (CCITT Group 4 / T.6, bilevel only — the scanner
    output shape)."""
    if px.ndim == 3:
        if px.shape[2] != 1:
            raise ValueError("encode_tiff takes single-channel pixels")
        px = px[..., 0]
    if px.ndim != 2 or px.dtype != np.uint8:
        raise ValueError("encode_tiff takes (h, w) uint8")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if compression not in ("packbits", "none", "g4"):
        raise ValueError("compression must be 'packbits', 'none' or 'g4'")
    if compression == "g4" and not bilevel:
        raise ValueError("G4 compression requires bilevel=True")
    e = "<" if byte_order == "II" else ">"
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")

    bits = None
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
        elif compression == "g4":
            # each strip is an independent T.6 block (reference line
            # resets to all white) so strips stay seekable
            strips.append(g4_encode(bits[s0 : s0 + rps]))
        else:
            strips.append(b"".join(chunk))

    n_strips = len(strips)
    comp_val = {"packbits": 32773, "g4": 4, "none": 1}[compression]

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
