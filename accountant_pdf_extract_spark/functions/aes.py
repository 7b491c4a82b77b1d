"""From-scratch AES (FIPS 197) + CBC, for PDF standard-security
crypt filters /AESV2 (AES-128) and /AESV3 (AES-256) — ISO 32000-1
§7.6.2 Algorithm 1 step b / §7.6.3.

Pure-Python table-driven core (the tables are DERIVED at import from
the GF(2^8) generator, not transcribed) with a libcrypto EVP fast
path self-checked against the pure core at import — same pattern as
the RC4 path in functions/pdfcrypt.py.  The test oracle carries an
independent, differently-structured AES (bitwise GF multiply, no
lookup tables) in tests/oracle.py.

PDF framing (both filters): ciphertext = 16-byte IV || CBC blocks,
plaintext padded per RFC 2898 (PKCS#7).  Malformed ciphertext
(length not a positive multiple of 16 after the IV, or an invalid
pad) raises ValueError — the parser degrades that document rather
than emitting garbage text.
"""

from __future__ import annotations

# ---------------------------------------------------------------- tables
# GF(2^8) with the AES polynomial x^8+x^4+x^3+x+1; generator 3.
_EXP = [0] * 512
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x ^= (_x << 1) ^ (0x11B if _x & 0x80 else 0)
for _i in range(255, 512):
    _EXP[_i] = _EXP[_i - 255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _rot8(v: int, n: int) -> int:
    return ((v << n) | (v >> (8 - n))) & 0xFF


# S-box: multiplicative inverse then the affine transform.
SBOX = [0] * 256
for _i in range(256):
    inv = _EXP[255 - _LOG[_i]] if _i else 0
    SBOX[_i] = (
        inv ^ _rot8(inv, 1) ^ _rot8(inv, 2) ^ _rot8(inv, 3) ^ _rot8(inv, 4)
    ) ^ 0x63
INV_SBOX = [0] * 256
for _i, _v in enumerate(SBOX):
    INV_SBOX[_v] = _i

_RCON = [1]
while len(_RCON) < 15:
    _RCON.append(_gmul(_RCON[-1], 2))

# T-tables: one 32-bit word per byte fusing SubBytes+MixColumns.
_T0 = []
for _i in range(256):
    s = SBOX[_i]
    _T0.append(
        (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
    )
_T1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T0]
_T2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T1]
_T3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T2]

_D0 = []
for _i in range(256):
    s = INV_SBOX[_i]
    _D0.append(
        (_gmul(s, 14) << 24)
        | (_gmul(s, 9) << 16)
        | (_gmul(s, 13) << 8)
        | _gmul(s, 11)
    )
_D1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D0]
_D2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D1]
_D3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D2]


# ------------------------------------------------------------ key schedule
def _expand_key(key: bytes) -> list[int]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (SBOX[(t >> 24) & 0xFF] << 24)
                | (SBOX[(t >> 16) & 0xFF] << 16)
                | (SBOX[(t >> 8) & 0xFF] << 8)
                | SBOX[t & 0xFF]
            )
            t ^= _RCON[i // nk - 1] << 24
        elif nk > 6 and i % nk == 4:
            t = (
                (SBOX[(t >> 24) & 0xFF] << 24)
                | (SBOX[(t >> 16) & 0xFF] << 16)
                | (SBOX[(t >> 8) & 0xFF] << 8)
                | SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


def _dec_key(w: list[int]) -> list[int]:
    """Equivalent-inverse-cipher schedule: reversed round keys with
    InvMixColumns applied to the inner rounds."""
    nr = len(w) // 4 - 1
    dw = []
    for r in range(nr, -1, -1):
        dw.extend(w[4 * r : 4 * r + 4])
    for i in range(4, 4 * nr):
        t = dw[i]
        dw[i] = (
            _D0[SBOX[(t >> 24) & 0xFF]]
            ^ _D1[SBOX[(t >> 16) & 0xFF]]
            ^ _D2[SBOX[(t >> 8) & 0xFF]]
            ^ _D3[SBOX[t & 0xFF]]
        )
    return dw


# --------------------------------------------------------------- blocks
def _encrypt_block(w: list[int], b: bytes) -> bytes:
    nr = len(w) // 4 - 1
    s0 = int.from_bytes(b[0:4], "big") ^ w[0]
    s1 = int.from_bytes(b[4:8], "big") ^ w[1]
    s2 = int.from_bytes(b[8:12], "big") ^ w[2]
    s3 = int.from_bytes(b[12:16], "big") ^ w[3]
    for r in range(1, nr):
        k = 4 * r
        t0 = (
            _T0[(s0 >> 24) & 0xFF] ^ _T1[(s1 >> 16) & 0xFF]
            ^ _T2[(s2 >> 8) & 0xFF] ^ _T3[s3 & 0xFF] ^ w[k]
        )
        t1 = (
            _T0[(s1 >> 24) & 0xFF] ^ _T1[(s2 >> 16) & 0xFF]
            ^ _T2[(s3 >> 8) & 0xFF] ^ _T3[s0 & 0xFF] ^ w[k + 1]
        )
        t2 = (
            _T0[(s2 >> 24) & 0xFF] ^ _T1[(s3 >> 16) & 0xFF]
            ^ _T2[(s0 >> 8) & 0xFF] ^ _T3[s1 & 0xFF] ^ w[k + 2]
        )
        t3 = (
            _T0[(s3 >> 24) & 0xFF] ^ _T1[(s0 >> 16) & 0xFF]
            ^ _T2[(s1 >> 8) & 0xFF] ^ _T3[s2 & 0xFF] ^ w[k + 3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = 4 * nr
    out = bytearray(16)
    for c, (a, b_, cc, d) in enumerate(
        ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
    ):
        kk = w[k + c]
        out[4 * c] = SBOX[(a >> 24) & 0xFF] ^ ((kk >> 24) & 0xFF)
        out[4 * c + 1] = SBOX[(b_ >> 16) & 0xFF] ^ ((kk >> 16) & 0xFF)
        out[4 * c + 2] = SBOX[(cc >> 8) & 0xFF] ^ ((kk >> 8) & 0xFF)
        out[4 * c + 3] = SBOX[d & 0xFF] ^ (kk & 0xFF)
    return bytes(out)


def _decrypt_block(dw: list[int], b: bytes) -> bytes:
    nr = len(dw) // 4 - 1
    s0 = int.from_bytes(b[0:4], "big") ^ dw[0]
    s1 = int.from_bytes(b[4:8], "big") ^ dw[1]
    s2 = int.from_bytes(b[8:12], "big") ^ dw[2]
    s3 = int.from_bytes(b[12:16], "big") ^ dw[3]
    for r in range(1, nr):
        k = 4 * r
        t0 = (
            _D0[(s0 >> 24) & 0xFF] ^ _D1[(s3 >> 16) & 0xFF]
            ^ _D2[(s2 >> 8) & 0xFF] ^ _D3[s1 & 0xFF] ^ dw[k]
        )
        t1 = (
            _D0[(s1 >> 24) & 0xFF] ^ _D1[(s0 >> 16) & 0xFF]
            ^ _D2[(s3 >> 8) & 0xFF] ^ _D3[s2 & 0xFF] ^ dw[k + 1]
        )
        t2 = (
            _D0[(s2 >> 24) & 0xFF] ^ _D1[(s1 >> 16) & 0xFF]
            ^ _D2[(s0 >> 8) & 0xFF] ^ _D3[s3 & 0xFF] ^ dw[k + 2]
        )
        t3 = (
            _D0[(s3 >> 24) & 0xFF] ^ _D1[(s2 >> 16) & 0xFF]
            ^ _D2[(s1 >> 8) & 0xFF] ^ _D3[s0 & 0xFF] ^ dw[k + 3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = 4 * nr
    out = bytearray(16)
    for c, (a, b_, cc, d) in enumerate(
        ((s0, s3, s2, s1), (s1, s0, s3, s2), (s2, s1, s0, s3), (s3, s2, s1, s0))
    ):
        kk = dw[k + c]
        out[4 * c] = INV_SBOX[(a >> 24) & 0xFF] ^ ((kk >> 24) & 0xFF)
        out[4 * c + 1] = INV_SBOX[(b_ >> 16) & 0xFF] ^ ((kk >> 16) & 0xFF)
        out[4 * c + 2] = INV_SBOX[(cc >> 8) & 0xFF] ^ ((kk >> 8) & 0xFF)
        out[4 * c + 3] = INV_SBOX[d & 0xFF] ^ (kk & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------ CBC
def _cbc_encrypt_py(key: bytes, iv: bytes, plain: bytes) -> bytes:
    w = _expand_key(key)
    pad = 16 - (len(plain) % 16)
    plain = plain + bytes([pad]) * pad
    prev = iv
    out = bytearray()
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        prev = _encrypt_block(w, blk)
        out += prev
    return bytes(out)


def _cbc_decrypt_py(key: bytes, iv: bytes, cipher: bytes) -> bytes:
    if not cipher or len(cipher) % 16:
        raise ValueError("AES-CBC ciphertext not a positive multiple of 16")
    dw = _dec_key(_expand_key(key))
    prev = iv
    out = bytearray()
    for i in range(0, len(cipher), 16):
        blk = cipher[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(dw, blk), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("invalid CBC padding")
    return bytes(out[:-pad])


def cbc_encrypt_nopad(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Raw CBC without padding (exact multiple of 16) — needed by the
    /AESV3 R6 hardened key-derivation loop (ISO 32000-2 Algorithm
    2.B uses AES-128-CBC-NoPad over the running digest)."""
    if len(plain) % 16:
        raise ValueError("NoPad CBC needs a multiple of 16")
    if _native is not None:
        return _native.cbc_raw(key, iv, plain, encrypt=True)
    w = _expand_key(key)
    prev = iv
    out = bytearray()
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        prev = _encrypt_block(w, blk)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, cipher: bytes) -> bytes:
    """Raw CBC decrypt without padding (exact multiple of 16) — the
    R6 /UE file-key unwrap and /Perms tamper check decrypt raw
    32/16-byte values (ISO 32000-2 Algorithms 2.A / 13)."""
    if len(cipher) % 16:
        raise ValueError("NoPad CBC needs a multiple of 16")
    if _native is not None:
        return _native.cbc_raw(key, iv, cipher, encrypt=False)
    dw = _dec_key(_expand_key(key))
    prev = iv
    out = bytearray()
    for i in range(0, len(cipher), 16):
        blk = cipher[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(dw, blk), prev))
        prev = blk
    return bytes(out)


# ----------------------------------------------------- libcrypto fast path
class _Native:
    """EVP one-shot CBC via libcrypto; padding handled by us (PDF pad
    errors must raise our ValueError, and EVP's pad check would
    conflate malformed-length with bad-pad)."""

    def __init__(self) -> None:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("crypto")
        if not name:
            raise OSError("no libcrypto")
        lc = ctypes.CDLL(name)
        self._ct = ctypes
        self._new = lc.EVP_CIPHER_CTX_new
        self._new.restype = ctypes.c_void_p
        self._free = lc.EVP_CIPHER_CTX_free
        self._free.argtypes = [ctypes.c_void_p]
        self._init = lc.EVP_CipherInit_ex
        self._init.argtypes = [ctypes.c_void_p] * 3 + [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
        self._pad = lc.EVP_CIPHER_CTX_set_padding
        self._pad.argtypes = [ctypes.c_void_p, ctypes.c_int]
        self._upd = lc.EVP_CipherUpdate
        self._upd.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int,
        ]
        self._fin = lc.EVP_CipherFinal_ex
        self._fin.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ]
        self._ciphers = {}
        for bits in (128, 192, 256):
            f = getattr(lc, f"EVP_aes_{bits}_cbc")
            f.restype = ctypes.c_void_p
            self._ciphers[bits // 8] = f()

    def cbc_raw(self, key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
        ct = self._ct
        ctx = self._new()
        try:
            if self._init(
                ctx, self._ciphers[len(key)], None, key, iv, int(encrypt)
            ) != 1:
                raise ValueError("EVP init failed")
            self._pad(ctx, 0)
            out = ct.create_string_buffer(len(data) + 16)
            n = ct.c_int(0)
            if self._upd(ctx, out, ct.byref(n), data, len(data)) != 1:
                raise ValueError("EVP update failed")
            total = n.value
            if self._fin(
                ctx, ct.cast(ct.addressof(out) + total, ct.c_char_p),
                ct.byref(n),
            ) != 1:
                raise ValueError("EVP final failed")
            total += n.value
            return out.raw[:total]
        finally:
            self._free(ctx)


_native = None
try:  # pragma: no cover - exercised implicitly by every call
    _cand = _Native()
    _k16, _k32 = bytes(range(16)), bytes(range(32))
    _iv, _pt = bytes(range(16, 32)), bytes(range(48))
    _pad16 = _pt + b"\x10" * 16
    ok = True
    for _k in (_k16, _k32):
        _ref = _cbc_encrypt_py(_k, _iv, _pt)
        if _cand.cbc_raw(_k, _iv, _pad16, encrypt=True) != _ref:
            ok = False
        if _cand.cbc_raw(_k, _iv, _ref, encrypt=False) != _pad16:
            ok = False
    if ok:
        _native = _cand
except Exception:
    _native = None


def cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """PKCS#7-padded AES-CBC encrypt (PDF Algorithm 1 step b, minus
    the IV prefix which the caller frames)."""
    if _native is not None:
        pad = 16 - (len(plain) % 16)
        return _native.cbc_raw(
            key, iv, plain + bytes([pad]) * pad, encrypt=True
        )
    return _cbc_encrypt_py(key, iv, plain)


def cbc_decrypt(key: bytes, iv: bytes, cipher: bytes) -> bytes:
    """PKCS#7-padded AES-CBC decrypt; raises ValueError on malformed
    length or pad (callers degrade the document, never emit garbage)."""
    if _native is not None:
        if not cipher or len(cipher) % 16:
            raise ValueError(
                "AES-CBC ciphertext not a positive multiple of 16"
            )
        out = _native.cbc_raw(key, iv, cipher, encrypt=False)
        pad = out[-1]
        if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
            raise ValueError("invalid CBC padding")
        return out[:-pad]
    return _cbc_decrypt_py(key, iv, cipher)
