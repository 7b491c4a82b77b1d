"""From-scratch JPEG (DCTDecode) codec — stdlib + numpy only.

Decode supports the subset scanned-document AND web corpora actually
ship: baseline sequential DCT (SOF0/SOF1) and progressive DCT (SOF2,
full spectral selection + successive approximation per T.81 Annex G —
web-sourced JPEGs are mostly progressive), 8-bit, 1 (grey), 3
(YCbCr) or 4 (Adobe CMYK/YCCK via the APP14 transform flag, stored
inverted per the Adobe convention, composited to RGB on output — the
print-workflow scan shape) components, 4:4:4 / 4:2:2 / 4:2:0
sampling, multiple DQT/DHT segments (tables may change between
progressive scans), byte stuffing, DRI/RSTn restart intervals.
Arithmetic coding, 12-bit and hierarchical raise ``ValueError`` —
the media kernels treat that as an unsupported payload and skip the
row (same contract as ``functions/png.py``).

Encode emits baseline sequential (grey, YCbCr 4:4:4/4:2:0, or CMYK/
YCCK 4:4:4 with the APP14 marker) with
the standard Annex-K quantization + Huffman tables, libjpeg quality
scaling, and byte stuffing; ``progressive=True`` emits a 5-stage SOF2
scan script (split-band spectral selection + one successive-
approximation level) that exercises every progressive decode path —
EOBRUN batching, ZRL, buffered correction bits.

Perf shape: FDCT/IDCT are one batched matrix multiply over all 8x8
blocks of a component; entropy coding is a per-symbol Python loop over
a 16-bit-peek lookup table (O(1) per symbol, no bit-at-a-time loop).

Public-knowledge format: ITU-T T.81 / ISO 10918-1 (Annex F baseline,
Annex K tables).
"""

from __future__ import annotations

import numpy as np

from accountant_pdf_extract_spark.functions.png import MAX_COMPONENTS

# zig-zag scan order (T.81 Figure 5): zigzag index -> block index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (luminance / chrominance), zigzag order
_QT_LUM = np.array([
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
], dtype=np.int64)
_QT_CHROM = np.array([
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16] counts, symbol values)
_HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: F = C @ X @ C.T, X = C.T @ F @ C."""
    x = np.arange(8, dtype=np.float64)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return c


_C = _dct_matrix()


def _canonical_codes(counts: list[int], symbols: list[int]):
    """(code, length) per symbol in spec order (T.81 Annex C)."""
    codes = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes.append((code, length, symbols[k]))
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(counts: list[int], symbols: list[int]) -> np.ndarray:
    """16-bit-peek lookup: tab[peek] = (symbol << 5) | code_length.
    One array index decodes any symbol (max code length 16)."""
    tab = np.zeros(1 << 16, dtype=np.int32)
    for code, length, sym in _canonical_codes(counts, symbols):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        tab[lo:hi] = (sym << 5) | length
    return tab


class _BitReader:
    """MSB-first reader over a DESTUFFED entropy segment."""

    __slots__ = ("d", "n", "pos")

    def __init__(self, data: bytes) -> None:
        self.d = data + b"\x00\x00\x00"  # peek slack past the end
        self.n = len(data) * 8
        self.pos = 0

    def peek16(self) -> int:
        byte = self.pos >> 3
        sh = self.pos & 7
        chunk = int.from_bytes(self.d[byte : byte + 3], "big")
        return (chunk >> (8 - sh)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n
        # strict end: a valid stream's final byte carries its own
        # 1-bit padding INSIDE the data, so consumption never passes
        # n — reading further means truncated entropy data (a +7
        # slack here let truncation inside the last byte decode the
        # zero slack bytes as data: garbage pixels, not ValueError)
        if self.pos > self.n:
            raise ValueError("jpeg: entropy data truncated")

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.skip(n)
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _read_u16(d: bytes, i: int) -> int:
    if i + 2 > len(d):
        raise ValueError("jpeg: truncated segment")
    return (d[i] << 8) | d[i + 1]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, c) uint8 (c = 1 grey, 3 RGB).

    Malformations this subset detects raise ``ValueError`` (the media
    kernels' skip-the-row contract): bad markers, truncated segments/
    entropy data, unsupported frames.  Segment-interior truncations
    surface as IndexError from bytes indexing, so the structural walk
    is wrapped here rather than guarding every field read."""
    try:
        return _decode_structure(data)
    except IndexError as e:
        raise ValueError("jpeg: truncated structure") from e


def _exif_orientation(tiff: bytes) -> int:
    """Exif APP1 payload (a little TIFF) → Orientation tag 274 value
    (1-8), defaulting to 1 on anything malformed or absent — a bad
    Exif block must never fail an otherwise-valid JPEG."""
    try:
        if tiff[:2] == b"II":
            e = "little"
        elif tiff[:2] == b"MM":
            e = "big"
        else:
            return 1
        if int.from_bytes(tiff[2:4], e) != 42:
            return 1
        off = int.from_bytes(tiff[4:8], e)
        count = int.from_bytes(tiff[off : off + 2], e)
        for k in range(count):
            p = off + 2 + 12 * k
            tag = int.from_bytes(tiff[p : p + 2], e)
            if tag == 274:
                v = int.from_bytes(tiff[p + 8 : p + 10], e)
                return v if 1 <= v <= 8 else 1
        return 1
    except (IndexError, ValueError):
        return 1


def _apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Rotate/flip decoded pixels into DISPLAY orientation (Exif tag
    274 semantics, the browser behavior).  1 = no-op; 5-8 swap the
    output dimensions."""
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1]
    if orientation == 5:  # transpose (TL-BR diagonal)
        return px.transpose(1, 0, 2)
    if orientation == 6:  # rotate 90° CW
        return np.rot90(px, -1)
    if orientation == 7:  # transverse (transpose + 180°)
        return np.rot90(px.transpose(1, 0, 2), 2)
    if orientation == 8:  # rotate 90° CCW
        return np.rot90(px, 1)
    return px


def _parse_dqt(seg: bytes, qt: dict) -> None:
    j = 0
    while j < len(seg):
        pq, tq = seg[j] >> 4, seg[j] & 15
        if pq != 0:
            raise ValueError("jpeg: 16-bit quant tables unsupported")
        if j + 65 > len(seg):
            raise ValueError("jpeg: truncated DQT")
        qt[tq] = np.frombuffer(
            seg[j + 1 : j + 65], dtype=np.uint8
        ).astype(np.int64)
        j += 65


def _parse_dht(seg: bytes, huff: dict) -> None:
    j = 0
    while j < len(seg):
        tc, th = seg[j] >> 4, seg[j] & 15
        counts = list(seg[j + 1 : j + 17])
        if len(counts) < 16:
            raise ValueError("jpeg: truncated DHT")
        nsym = sum(counts)
        symbols = list(seg[j + 17 : j + 17 + nsym])
        if len(symbols) < nsym:
            raise ValueError("jpeg: truncated DHT symbols")
        huff[(tc, th)] = _decode_table(counts, symbols)
        j += 17 + nsym


def _decode_structure(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("jpeg: bad SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], np.ndarray] = {}
    restart_interval = 0
    frame = None
    adobe = -1  # APP14 color transform (-1 = no Adobe marker)
    orientation = 1  # Exif tag 274 (1 = upright)
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them instead of parsing 0xFF as an
        # unknown segment with a bogus length
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1] if i + 1 < len(data) else 0
        i += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("jpeg: no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seg_len = _read_u16(data, i)
        seg = data[i + 2 : i + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        i += seg_len
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"jpeg: {prec}-bit unsupported")
            h, w = _read_u16(seg, 1), _read_u16(seg, 3)
            ncomp = seg[5]
            if ncomp not in (1, 3, 4):
                raise ValueError(f"jpeg: {ncomp}-component unsupported")
            comps = []
            for ci in range(ncomp):
                cid = seg[6 + 3 * ci]
                samp = seg[7 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 15,
                     "tq": seg[8 + 3 * ci]}
                )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker == 0xEE:  # APP14: Adobe color-transform flag
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe = seg[11]
        elif marker == 0xE1:  # APP1: Exif orientation (tag 274)
            if seg[:6] == b"Exif\x00\x00":
                orientation = _exif_orientation(seg[6:])
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential / progressive supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = _read_u16(seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            frame["adobe"] = adobe
            if frame["progressive"]:
                px = _decode_progressive(
                    data, i, seg, frame, qt, huff, restart_interval
                )
                return _apply_orientation(px, orientation)
            ns = seg[0]
            scan_tabs = {}
            for si in range(ns):
                cid = seg[1 + 2 * si]
                tsel = seg[2 + 2 * si]
                scan_tabs[cid] = (tsel >> 4, tsel & 15)
            px = _decode_scan(
                data, i, frame, qt, huff, scan_tabs, restart_interval
            )
            return _apply_orientation(px, orientation)
        # APPn / COM / anything else: skipped
    raise ValueError("jpeg: no SOS marker")


def _destuff(data: bytes, start: int) -> tuple[list[bytes], int]:
    """(entropy-coded segments from `start` split at RSTn markers with
    byte-stuffing (FF 00) removed, index of the terminating 0xFF
    marker byte — or len(data) when the stream just ends)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any other marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_scan(data, start, frame, qt, huff, scan_tabs, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    ncomp = len(comps)
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty dimensions")
    if h * w * ncomp > MAX_COMPONENTS:
        raise ValueError("jpeg: image too large")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ValueError("jpeg: unsupported sampling factors")
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise ValueError("jpeg: unsupported sampling factors")
        if c["tq"] not in qt:
            raise ValueError("jpeg: missing quant table")
        if c["id"] not in scan_tabs:
            raise ValueError("jpeg: scan component not in frame")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # per-component coefficient storage (blocks in MCU raster order)
    blocks: list[np.ndarray] = []
    for c in comps:
        nb = n_mcu * c["h"] * c["v"]
        blocks.append(np.zeros((nb, 64), dtype=np.int64))
    counters = [0] * ncomp

    segs, _end = _destuff(data, start)
    seg_i = 0
    br = _BitReader(segs[0])
    pred = [0] * ncomp
    zz = ZIGZAG
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("jpeg: missing restart segment")
            br = _BitReader(segs[seg_i])
            pred = [0] * ncomp
        for ci, c in enumerate(comps):
            dc_t, ac_t = scan_tabs[c["id"]]
            dtab = huff.get((0, dc_t))
            atab = huff.get((1, ac_t))
            if dtab is None or atab is None:
                raise ValueError("jpeg: missing huffman table")
            for _ in range(c["h"] * c["v"]):
                coef = blocks[ci][counters[ci]]
                counters[ci] += 1
                # DC
                e = int(dtab[br.peek16()])
                if e == 0:
                    raise ValueError("jpeg: bad huffman code")
                br.skip(e & 31)
                t = e >> 5
                pred[ci] += _extend(br.receive(t), t)
                coef[0] = pred[ci]
                # AC
                k = 1
                while k < 64:
                    e = int(atab[br.peek16()])
                    if e == 0:
                        raise ValueError("jpeg: bad huffman code")
                    br.skip(e & 31)
                    rs = e >> 5
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("jpeg: AC index overflow")
                    coef[zz[k]] = _extend(br.receive(s), s)
                    k += 1

    # dequantize + batched IDCT + assemble planes
    planes = []
    for ci, c in enumerate(comps):
        q = np.zeros(64, dtype=np.int64)
        q[zz] = qt[c["tq"]]
        bl = (blocks[ci] * q[None, :]).astype(np.float64).reshape(-1, 8, 8)
        px = np.einsum("ij,njk,kl->nil", _C.T, bl, _C) + 128.0
        px = np.clip(np.rint(px), 0, 255).astype(np.uint8)
        bw = mcux * c["h"]  # blocks per row for this component
        bh = mcuy * c["v"]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = px[bi]
                        bi += 1
        # upsample to full resolution (nearest, the JFIF default view)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    return _planes_to_pixels(planes, ncomp, frame.get("adobe", -1))


def _ycbcr_to_rgb(planes) -> np.ndarray:
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    return np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )


def _planes_to_pixels(planes, ncomp: int, adobe: int) -> np.ndarray:
    """Component planes → (h, w, 1|3) uint8.  3-comp = JFIF YCbCr.
    4-comp = Adobe CMYK (APP14 transform 0, stored INVERTED per the
    Adobe convention) or YCCK (transform 2: YCbCr carries inverted
    CMY); both composite to RGB output — R = C'·K'/255 etc., where
    C'/K' are the stored (inverted) values."""
    if ncomp == 1:
        return planes[0][:, :, None]
    if ncomp == 3:
        rgb = _ycbcr_to_rgb(planes)
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    if adobe == 2:  # YCCK: the YCbCr transform holds inverted CMY
        cmy = np.clip(_ycbcr_to_rgb(planes[:3]), 0.0, 255.0)
    else:  # transform 0 / missing APP14: inverted CMYK stored direct
        cmy = np.stack(
            [p.astype(np.float64) for p in planes[:3]], axis=2
        )
    k = planes[3].astype(np.float64)[:, :, None]
    rgb = cmy * k / 255.0
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Progressive (SOF2) decoder — T.81 Annex G.2, Huffman coding
# --------------------------------------------------------------------------


def _decode_progressive(data, i, sos_seg, frame, qt, huff, restart_interval):
    """Accumulate DCT coefficients across every progressive scan
    (spectral selection + successive approximation), then dequantize /
    IDCT once.  Coefficient storage is RASTER block order per
    component over the MCU-padded grid."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    ncomp = len(comps)
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty dimensions")
    if h * w * ncomp > MAX_COMPONENTS:
        raise ValueError("jpeg: image too large")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise ValueError("jpeg: unsupported sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    grids = []  # (bw_pad, bh_pad, bw_comp, bh_comp) per component
    coeffs = []
    for c in comps:
        bw_pad, bh_pad = mcux * c["h"], mcuy * c["v"]
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        grids.append((bw_pad, bh_pad, -(-cw // 8), -(-ch_ // 8)))
        coeffs.append(np.zeros((bh_pad * bw_pad, 64), dtype=np.int64))

    seg = sos_seg
    while True:
        i = _decode_prog_scan(
            data, i, seg, comps, huff, restart_interval, coeffs, grids,
            mcux, mcuy,
        )
        # marker walk to the next SOS (tables may change between
        # scans) or EOI
        nxt = None
        while i < len(data):
            if data[i] != 0xFF:
                raise ValueError("jpeg: marker expected")
            while i + 1 < len(data) and data[i + 1] == 0xFF:
                i += 1  # fill bytes
            if i + 1 >= len(data):
                raise ValueError("jpeg: truncated marker")
            marker = data[i + 1]
            i += 2
            if marker == 0xD9:
                nxt = "eoi"
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue
            seg_len = _read_u16(data, i)
            s2 = data[i + 2 : i + seg_len]
            if len(s2) != seg_len - 2:
                raise ValueError("jpeg: truncated segment")
            i += seg_len
            if marker == 0xC4:
                _parse_dht(s2, huff)
            elif marker == 0xDB:
                _parse_dqt(s2, qt)
            elif marker == 0xDD:
                restart_interval = _read_u16(s2, 0)
            elif marker == 0xDA:
                seg = s2
                nxt = "sos"
                break
            # APPn / COM skipped
        if nxt is None:
            # ran off the end without SOS or EOI: a truncated download
            # must raise (skip-the-row contract), not silently return
            # a partially-refined image
            raise ValueError("jpeg: truncated between scans")
        if nxt != "sos":
            break

    # dequantize + batched IDCT + assemble planes (raster order)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ValueError("jpeg: missing quant table")
        q = np.zeros(64, dtype=np.int64)
        q[ZIGZAG] = qt[c["tq"]]
        bl = (coeffs[ci] * q[None, :]).astype(np.float64).reshape(-1, 8, 8)
        px = np.einsum("ij,njk,kl->nil", _C.T, bl, _C) + 128.0
        px = np.clip(np.rint(px), 0, 255).astype(np.uint8)
        bw_pad, bh_pad, _bw, _bh = grids[ci]
        plane = (
            px.reshape(bh_pad, bw_pad, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_pad * 8, bw_pad * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    return _planes_to_pixels(planes, ncomp, frame.get("adobe", -1))


def _decode_prog_scan(
    data, i, seg, comps, huff, restart_interval, coeffs, grids, mcux, mcuy
):
    """One progressive scan's entropy data; returns the index of the
    terminating marker's 0xFF byte."""
    ns = seg[0]
    scomps = []  # (ci, dc_table, ac_table)
    for si in range(ns):
        cid = seg[1 + 2 * si]
        tsel = seg[2 + 2 * si]
        ci = next(
            (k for k, c in enumerate(comps) if c["id"] == cid), None
        )
        if ci is None:
            raise ValueError("jpeg: scan component not in frame")
        scomps.append((ci, tsel >> 4, tsel & 15))
    ss = seg[1 + 2 * ns]
    se = seg[2 + 2 * ns]
    ahal = seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    if not (0 <= ss <= se <= 63) or al > 13 or ah > 13:
        raise ValueError("jpeg: bad progressive scan parameters")
    if ss == 0 and se != 0:
        raise ValueError("jpeg: DC scan must have Se=0")  # G.1.1.1.1
    if ss > 0 and ns != 1:
        raise ValueError("jpeg: AC scans are non-interleaved")
    zz = ZIGZAG
    segs, end = _destuff(data, i)
    seg_i = 0
    br = _BitReader(segs[0])

    def next_segment():
        nonlocal seg_i, br
        seg_i += 1
        if seg_i >= len(segs):
            raise ValueError("jpeg: missing restart segment")
        br = _BitReader(segs[seg_i])

    if ss == 0:
        # ---- DC scan (interleaved over MCUs, or single-component) ----
        preds = {ci: 0 for ci, _d, _a in scomps}
        units = []  # one unit = one MCU (interleaved) or one block
        if ns > 1:
            for mi in range(mcux * mcuy):
                my, mx = divmod(mi, mcux)
                unit = []
                for ci, dt, _at in scomps:
                    c = comps[ci]
                    bw_pad = grids[ci][0]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = (my * c["v"] + by) * bw_pad + (
                                mx * c["h"] + bx
                            )
                            unit.append((ci, dt, idx))
                units.append(unit)
        else:
            ci, dt, _at = scomps[0]
            bw_pad, _bh_pad, bw_c, bh_c = grids[ci]
            for by in range(bh_c):
                for bx in range(bw_c):
                    units.append([(ci, dt, by * bw_pad + bx)])
        if ah == 0:
            dtabs = {}
            for ci, dt, _at in scomps:
                tab = huff.get((0, dt))
                if tab is None:
                    raise ValueError("jpeg: missing huffman table")
                dtabs[ci] = tab
        for ui, unit in enumerate(units):
            if restart_interval and ui and ui % restart_interval == 0:
                next_segment()
                preds = {k: 0 for k in preds}
            for ci, _dt, idx in unit:
                coef = coeffs[ci][idx]
                if ah == 0:
                    e = int(dtabs[ci][br.peek16()])
                    if e == 0:
                        raise ValueError("jpeg: bad huffman code")
                    br.skip(e & 31)
                    t = e >> 5
                    preds[ci] += _extend(br.receive(t), t)
                    coef[0] = preds[ci] << al
                else:  # DC refinement: one raw bit per block
                    if br.receive(1):
                        coef[0] |= 1 << al
    else:
        # ---- AC scan (single component, raster block order) ----------
        ci, _dt, at = scomps[0]
        atab = huff.get((1, at))
        if atab is None:
            raise ValueError("jpeg: missing huffman table")
        bw_pad, _bh_pad, bw_c, bh_c = grids[ci]
        eobrun = 0
        bi = 0
        for by in range(bh_c):
            for bx in range(bw_c):
                if restart_interval and bi and bi % restart_interval == 0:
                    next_segment()
                    eobrun = 0
                bi += 1
                coef = coeffs[ci][by * bw_pad + bx]
                if ah == 0:
                    eobrun = _ac_first(
                        coef, br, atab, ss, se, al, eobrun, zz
                    )
                else:
                    eobrun = _ac_refine(
                        coef, br, atab, ss, se, al, eobrun, zz
                    )
    return end


def _ac_first(coef, br, atab, ss, se, al, eobrun, zz):
    """G.2.2: first AC scan of a band — EOBRUN + (run, size) codes."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        e = int(atab[br.peek16()])
        if e == 0:
            raise ValueError("jpeg: bad huffman code")
        br.skip(e & 31)
        rs = e >> 5
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC index overflow")
        coef[zz[k]] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(coef, br, atab, ss, se, al, eobrun, zz):
    """G.1.2.3 coefficient correction: refine already-nonzero
    coefficients with one bit each while inserting newly-nonzero
    ±1<<al values; runs count ZERO-history positions only."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(z):
        if br.receive(1) and not (coef[z] & p1):
            coef[z] += p1 if coef[z] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            e = int(atab[br.peek16()])
            if e == 0:
                raise ValueError("jpeg: bad huffman code")
            br.skip(e & 31)
            rs = e >> 5
            r, s = rs >> 4, rs & 15
            if s == 0 and r < 15:  # EOBn — FULL count incl. this block
                eobrun = 1 << r
                if r:
                    eobrun += br.receive(r)
                break
            if s == 0:
                val = 0  # ZRL: pass 16 zero-history positions
            elif s == 1:
                val = p1 if br.receive(1) else m1
            else:
                raise ValueError("jpeg: bad refinement size")
            while k <= se:
                z = int(zz[k])
                if coef[z]:
                    correct(z)
                    k += 1
                    continue
                if r == 0:
                    break
                r -= 1
                k += 1
            if s and k <= se:
                coef[int(zz[k])] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = int(zz[k])
            if coef[z]:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


# --------------------------------------------------------------------------
# Encoder (baseline sequential, 4:4:4, standard tables)
# --------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_tables(counts, symbols):
    return {s: (c, ln) for c, ln, s in _canonical_codes(counts, symbols)}


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64, H/W multiples of 8 → (n, 8, 8) in raster order."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _quantized_coefs(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) plane (multiples of 8) → (nblocks, 64) quantized zigzag
    coefficients, blocks in raster order.  One batched FDCT."""
    q = np.zeros(64, dtype=np.int64)
    q[ZIGZAG] = qtab
    f = np.einsum("ij,njk,kl->nil", _C, _to_blocks(plane) - 128.0, _C.T)
    return np.rint(f.reshape(-1, 64) / q[None, :]).astype(np.int64)[:, ZIGZAG]


def _put_block(bw, row, pred, dc_codes, ac_codes) -> int:
    """Huffman-encode one quantized zigzag block; returns the new DC
    predictor."""
    diff = int(row[0]) - pred
    t = abs(diff).bit_length()
    mag = diff + (1 << t) - 1 if diff < 0 else diff
    cd, ln = dc_codes[t]
    bw.put(cd, ln)
    if t:
        bw.put(mag, t)
    run = 0
    nzi = np.nonzero(row[1:])[0]
    last = int(nzi[-1]) + 1 if len(nzi) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            cd, ln = ac_codes[0xF0]
            bw.put(cd, ln)
            run -= 16
        s = abs(v).bit_length()
        mag = v + (1 << s) - 1 if v < 0 else v
        cd, ln = ac_codes[(run << 4) | s]
        bw.put(cd, ln)
        bw.put(mag, s)
        run = 0
    if last < 63:
        cd, ln = ac_codes[0x00]  # EOB
        bw.put(cd, ln)
    return int(row[0])


def _emit_prog_scans(
    out, coefs, grid_w, samp_hv, c, h, w, xs, ys, pw, ph, dc_codes
):
    """Emit the 5-stage progressive scan script (T.81 Annex G
    encoding, mirroring libjpeg's jcphuff shapes): DC first (Al=1,
    interleaved), per-component split-band AC first (Al=1), AC
    refinement (Ah=1, Al=0) with EOBRUN batching + buffered
    correction bits, DC refinement (raw bits)."""
    ac = _encode_tables(*_HT_AC_PROG)
    mcux, mcuy = pw // (8 * xs), ph // (8 * ys)

    def sos(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            dc_t = 0 if cid == 1 else 1
            p += bytes([cid, (dc_t << 4) | 0])
        p += bytes([ss, se, (ah << 4) | al])
        out.extend(_seg(0xDA, p))

    # unpadded per-component block dims (AC scans cover exactly these)
    dims = []
    for ci in range(c):
        cw = w if ci == 0 else -(-w // xs)
        ch_ = h if ci == 0 else -(-h // ys)
        dims.append((-(-cw // 8), -(-ch_ // 8)))

    def mcu_block_order():
        for mi in range(mcux * mcuy):
            my, mx = divmod(mi, mcux)
            for ci in range(c):
                sh, sv = samp_hv[ci]
                for by in range(sv):
                    for bx in range(sh):
                        yield ci, (my * sv + by) * grid_w[ci] + (
                            mx * sh + bx
                        )

    # ---- scan 1: DC first, Al=1, interleaved --------------------------
    sos(list(range(1, c + 1)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * c
    for ci, bi in mcu_block_order():
        v = int(coefs[ci][bi][0]) >> 1  # DC point transform: arith shift
        diff = v - preds[ci]
        preds[ci] = v
        t = abs(diff).bit_length()
        mag = diff + (1 << t) - 1 if diff < 0 else diff
        cd, ln = dc_codes[ci][t]
        bw.put(cd, ln)
        if t:
            bw.put(mag, t)
    bw.flush()
    out.extend(bw.out)

    # two correction-bit buffers (libjpeg's BE/BR split): "be" bits
    # belong to the pending EOB run and flush right after its EOBn
    # code; "br" bits belong to the CURRENT block and flush after its
    # next emitted symbol — one shared buffer mis-orders them
    state = {"eobrun": 0, "be": [], "br": []}

    def put_eobrun(bw):
        if state["eobrun"]:
            nb = state["eobrun"].bit_length() - 1
            cd, ln = ac[nb << 4]
            bw.put(cd, ln)
            if nb:
                bw.put(state["eobrun"] & ((1 << nb) - 1), nb)
            for bit in state["be"]:
                bw.put(bit, 1)
            state["eobrun"] = 0
            state["be"] = []

    def flush_br(bw):
        for bit in state["br"]:
            bw.put(bit, 1)
        state["br"] = []

    # ---- scans 2-3: AC first, Al=1, split band, per component ---------
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(c):
            bw_c, bh_c = dims[ci]
            sos([ci + 1], ss, se, 0, 1)
            bw = _BitWriter()
            state["eobrun"], state["be"], state["br"] = 0, [], []
            for by in range(bh_c):
                for bx in range(bw_c):
                    row = coefs[ci][by * grid_w[ci] + bx]
                    ts = []
                    for k in range(ss, se + 1):
                        v = int(row[k])
                        ts.append(v // 2 if v >= 0 else -((-v) // 2))
                    last = -1
                    for idx, t in enumerate(ts):
                        if t:
                            last = idx
                    if last < 0:
                        state["eobrun"] += 1
                        if state["eobrun"] == 0x7FFF:
                            put_eobrun(bw)
                        continue
                    put_eobrun(bw)
                    r = 0
                    for idx in range(last + 1):
                        t = ts[idx]
                        if t == 0:
                            r += 1
                            continue
                        while r > 15:
                            cd, ln = ac[0xF0]
                            bw.put(cd, ln)
                            r -= 16
                        s = abs(t).bit_length()
                        mag = t + (1 << s) - 1 if t < 0 else t
                        cd, ln = ac[(r << 4) | s]
                        bw.put(cd, ln)
                        bw.put(mag, s)
                        r = 0
                    if last < len(ts) - 1:
                        state["eobrun"] += 1
                        if state["eobrun"] == 0x7FFF:
                            put_eobrun(bw)
            put_eobrun(bw)
            bw.flush()
            out.extend(bw.out)

    # ---- scan 4: AC refinement, Ah=1 Al=0, per component --------------
    for ci in range(c):
        bw_c, bh_c = dims[ci]
        sos([ci + 1], 1, 63, 1, 0)
        bw = _BitWriter()
        state["eobrun"], state["be"], state["br"] = 0, [], []
        for by in range(bh_c):
            for bx in range(bw_c):
                row = coefs[ci][by * grid_w[ci] + bx]
                ts = [int(row[k]) for k in range(1, 64)]
                ke = -1  # last newly-nonzero (|t| == 1) position
                for idx, t in enumerate(ts):
                    if abs(t) == 1:
                        ke = idx
                if ke < 0:
                    state["eobrun"] += 1
                    state["be"] += [abs(t) & 1 for t in ts if t]
                    if state["eobrun"] == 0x7FFF or len(state["be"]) > 900:
                        put_eobrun(bw)
                    continue
                r = 0
                for idx in range(ke + 1):
                    t = ts[idx]
                    a = abs(t)
                    if a == 0:
                        r += 1
                        continue
                    # libjpeg shape: emit ZRLs lazily at the NEXT
                    # nonzero position so each ZRL flushes only the
                    # correction bits inside its own 16-zero span
                    while r > 15:
                        put_eobrun(bw)
                        cd, ln = ac[0xF0]
                        bw.put(cd, ln)
                        r -= 16
                        flush_br(bw)
                    if a > 1:
                        state["br"].append(a & 1)
                        continue
                    put_eobrun(bw)
                    cd, ln = ac[(r << 4) | 1]
                    bw.put(cd, ln)
                    bw.put(1 if t > 0 else 0, 1)
                    flush_br(bw)
                    r = 0
                if ke < len(ts) - 1:
                    state["eobrun"] += 1
                    state["be"] += [
                        abs(t) & 1 for t in ts[ke + 1 :] if t
                    ]
                    if state["eobrun"] == 0x7FFF or len(state["be"]) > 900:
                        put_eobrun(bw)
        put_eobrun(bw)
        bw.flush()
        out.extend(bw.out)

    # ---- scan 5: DC refinement, raw bit per block, interleaved --------
    sos(list(range(1, c + 1)), 0, 0, 1, 0)
    bw = _BitWriter()
    for ci, bi in mcu_block_order():
        bw.put(int(coefs[ci][bi][0]) & 1, 1)
    bw.flush()
    out.extend(bw.out)


# Progressive AC table: ALL 256 RS symbols — 255 at code length 9 plus
# one at length 10 (DHT counts are single bytes, so 256-at-one-length
# is unrepresentable; the split stays a legal canonical code well
# under the all-ones ceiling).  Annex-K AC tables lack the EOBn
# symbols (0x10..0xE0) progressive scans emit, so the progressive
# encoder ships its own table.
_HT_AC_PROG = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    adobe_transform: int = 2,
    exif_orientation: int | None = None,
) -> bytes:
    """(h, w) / (h, w, 1) grey, (h, w, 3) RGB or (h, w, 4) CMYK
    (ink values) uint8 → JPEG.

    4-channel input emits the Adobe print shape: an APP14 marker with
    ``adobe_transform`` 2 (YCCK — inverted CMY through the YCbCr
    transform, K inverted alongside) or 0 (inverted CMYK stored
    direct); 4:4:4 baseline only.  The decoder composites these back
    to RGB.

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (2x2 Y blocks + box-averaged chroma — the real-world scan default).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (resynchronization points, exercised by the decoder).
    ``progressive=True`` emits SOF2 with a 5-stage scan script (DC
    first Al=1, split-band AC first Al=1, AC refinement, DC
    refinement) so every progressive decode path — EOBRUN batching,
    ZRL, correction bits — is exercised; incompatible with
    ``restart_interval``."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3, 4):
        raise ValueError(f"unsupported pixel shape {px.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if progressive and restart_interval:
        raise ValueError("restart intervals unsupported with progressive")
    if px.shape[2] == 4:
        if adobe_transform not in (0, 2):
            raise ValueError("adobe_transform must be 0 (CMYK) or 2 (YCCK)")
        if subsampling != "444" or progressive:
            raise ValueError("CMYK emits 4:4:4 baseline only")
    h, w, c = px.shape
    if h == 0 or w == 0:
        raise ValueError(f"empty image dimensions {w}x{h}")
    sub = subsampling == "420" and c == 3
    ys, xs = (2, 2) if sub else (1, 1)  # Y sampling factors
    qlum = _scale_qt(_QT_LUM, quality)
    qchrom = _scale_qt(_QT_CHROM, quality)

    # pad to the MCU grid by edge replication
    mcu_h, mcu_w = 8 * ys, 8 * xs
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    pad = np.pad(px.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)),
                 mode="edge")
    if c == 4:
        # Adobe inversion: stored = 255 - ink.  transform 2 routes the
        # inverted CMY through the forward YCbCr transform (YCCK).
        inv = 255.0 - pad
        if adobe_transform == 2:
            r, g, b = inv[:, :, 0], inv[:, :, 1], inv[:, :, 2]
            planes = [
                0.299 * r + 0.587 * g + 0.114 * b,
                128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
                inv[:, :, 3],
            ]
        else:
            planes = [inv[:, :, k] for k in range(4)]
    elif c == 3:
        r, g, b = pad[:, :, 0], pad[:, :, 1], pad[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        if sub:
            # 2x2 box-average chroma down to one sample per Y quad
            planes[1:] = [
                p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                for p in planes[1:]
            ]
    else:
        planes = [pad[:, :, 0]]

    out = bytearray(b"\xff\xd8")  # SOI
    if exif_orientation is not None:
        if not 1 <= exif_orientation <= 8:
            raise ValueError("exif_orientation must be 1-8")
        # minimal Exif APP1: II TIFF, one IFD entry (tag 274 SHORT)
        tiff = (
            b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (274).to_bytes(2, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little")
            + exif_orientation.to_bytes(2, "little") + b"\x00\x00"
            + b"\x00\x00\x00\x00"
        )
        out += _seg(0xE1, b"Exif\x00\x00" + tiff)
    if c == 4:
        # APP14: "Adobe", version 100, flags0/flags1 0, transform
        out += _seg(
            0xEE,
            b"Adobe" + bytes([0, 100, 0, 0, 0, 0, adobe_transform]),
        )
    else:
        out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qlum.astype(np.uint8)))
    if c >= 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(qchrom.astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([c])
    for ci in range(c):
        samp = (ys << 4) | xs if ci == 0 else 0x11
        # K (ci 3) rides the luminance quant table like Y
        sof += bytes([ci + 1, samp, 0 if ci in (0, 3) else 1])
    out += _seg(0xC2 if progressive else 0xC0, sof)
    if progressive:
        tables = [(0, 0, _HT_DC_LUM), (1, 0, _HT_AC_PROG)]
        if c == 3:
            tables.insert(1, (0, 1, _HT_DC_CHROM))
    else:
        tables = [
            (0, 0, _HT_DC_LUM), (1, 0, _HT_AC_LUM),
            (0, 1, _HT_DC_CHROM), (1, 1, _HT_AC_CHROM),
        ][: 2 if c == 1 else 4]
    for tc, th, (counts, syms) in tables:
        out += _seg(
            0xC4,
            bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms),
        )
    if restart_interval > 0:
        out += _seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    if not progressive:
        sos = bytes([c])
        for ci in range(c):
            sos += bytes([ci + 1, 0x00 if ci in (0, 3) else 0x11])
        sos += bytes([0, 63, 0])
        out += _seg(0xDA, sos)

    dc_l = _encode_tables(*_HT_DC_LUM)
    ac_l = _encode_tables(*_HT_AC_LUM)
    dc_c = _encode_tables(*_HT_DC_CHROM)
    ac_c = _encode_tables(*_HT_AC_CHROM)
    qtabs = [qlum, qchrom, qchrom, qlum]
    dcs = [dc_l, dc_c, dc_c, dc_l]
    acs = [ac_l, ac_c, ac_c, ac_l]
    coefs = [_quantized_coefs(planes[ci], qtabs[ci]) for ci in range(c)]
    # per-component block-grid widths (blocks in raster order)
    grid_w = [pw // 8 if ci == 0 else pw // (8 * xs) for ci in range(c)]
    samp_hv = [(xs, ys) if ci == 0 else (1, 1) for ci in range(c)]

    if progressive:
        _emit_prog_scans(
            out, coefs, grid_w, samp_hv, c, h, w, xs, ys, pw, ph,
            [dc_l, dc_c, dc_c],
        )
        out += b"\xff\xd9"
        return bytes(out)

    bw = _BitWriter()
    preds = [0] * c
    mcux, mcuy = pw // mcu_w, ph // mcu_h
    rst = 0
    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * c
        my, mx = divmod(mi, mcux)
        for ci in range(c):
            sh, sv = samp_hv[ci]
            for by in range(sv):
                for bx in range(sh):
                    bi = (my * sv + by) * grid_w[ci] + (mx * sh + bx)
                    preds[ci] = _put_block(
                        bw, coefs[ci][bi], preds[ci], dcs[ci], acs[ci]
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
