"""Standard security handler primitives (ISO 32000-1 §7.6): RC4 and
the MD5-based key-derivation algorithms for /Filter /Standard with
/V 1 (40-bit RC4) and /V 2 (up to 128-bit RC4), revisions R 2 and 3.

Used by the parser (decrypt with the EMPTY user password — the common
e-mailed-invoice case) and by the writer (emit encrypted fixtures).
The test oracle reimplements these algorithms independently in the
latin-1 string plane; only ``spec.PDF_PAD`` is shared.

AES (/V 4+, AESV2/AESV3 crypt filters) is intentionally out of scope
this round — the parser degrades unsupported encryption to an
unreadable (zero-page) document rather than mis-decoding it.
"""

from __future__ import annotations

import hashlib

from accountant_pdf_extract_spark import spec


def _rc4_py(key: bytes, data: bytes) -> bytes:
    """Pure-Python RC4 — reference implementation and portable
    fallback (also the self-check oracle for the libcrypto path)."""
    s = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % kl]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# libcrypto fast path: the legacy RC4_set_key/RC4 symbols are direct
# (not provider-gated) and ~100x the pure-Python byte loop, which
# otherwise costs ~20% of the whole extraction kernel on an
# encrypted-doc corpus.  Verified against _rc4_py at import; any
# failure (missing lib, stubbed symbols, wrong output) silently keeps
# the portable fallback.
_rc4_native = None
try:  # pragma: no cover - exercised implicitly by every rc4() call
    import ctypes
    import ctypes.util

    _name = ctypes.util.find_library("crypto")
    if _name:
        _lc = ctypes.CDLL(_name)
        _lc.RC4_set_key.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
        ]
        _lc.RC4_set_key.restype = None
        _lc.RC4.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        _lc.RC4.restype = None

        def _rc4_ossl(key: bytes, data: bytes) -> bytes:
            st = ctypes.create_string_buffer(2048)  # >= rc4_key_st
            _lc.RC4_set_key(st, len(key), key)
            out = ctypes.create_string_buffer(len(data))
            _lc.RC4(st, len(data), data, out)
            return out.raw

        _probe_k, _probe_d = b"\x01\x02\x03\x04\x05", bytes(range(64))
        if _rc4_ossl(_probe_k, _probe_d) == _rc4_py(_probe_k, _probe_d):
            _rc4_native = _rc4_ossl
except Exception:
    _rc4_native = None


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (the PDF 'V2' cipher) — symmetric, so this is both
    encrypt and decrypt."""
    if _rc4_native is not None:
        return _rc4_native(key, data)
    return _rc4_py(key, data)


def _padded(pw: bytes) -> bytes:
    return (pw + spec.PDF_PAD)[:32]


def file_key(
    o_value: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int = 40,
    user_pw: bytes = b"",
) -> bytes:
    """Algorithm 2: the file encryption key from the (possibly empty)
    user password, /O, /P (as 4-byte little-endian two's complement),
    and the first file identifier."""
    n = max(5, min(16, length_bits // 8))
    h = hashlib.md5()
    h.update(_padded(user_pw))
    h.update(o_value[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def object_key(fkey: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1: the per-object RC4 key — MD5(file key + 3 LE bytes
    of the object number + 2 LE bytes of the generation), truncated to
    key length + 5 (max 16)."""
    h = hashlib.md5(
        fkey + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return h[: min(len(fkey) + 5, 16)]


def owner_value(
    owner_pw: bytes, user_pw: bytes, r: int, length_bits: int = 40
) -> bytes:
    """Algorithm 3: the /O entry (an empty owner password falls back
    to the user password per the spec)."""
    n = max(5, min(16, length_bits // 8))
    key = hashlib.md5(_padded(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = rc4(key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def user_value(fkey: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3): the /U entry."""
    if r == 2:
        return rc4(fkey, spec.PDF_PAD)
    u = rc4(fkey, hashlib.md5(spec.PDF_PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in fkey), u)
    return u + b"\x00" * 16  # 16 bytes of arbitrary padding


def check_user_password(
    u_value: bytes, fkey: bytes, id0: bytes, r: int
) -> bool:
    """Algorithm 6: does the (empty) user password open this file?
    R3 compares only the first 16 bytes (the rest is padding)."""
    expect = user_value(fkey, id0, r)
    if r >= 3:
        return u_value[:16] == expect[:16]
    return u_value[:32] == expect[:32]
