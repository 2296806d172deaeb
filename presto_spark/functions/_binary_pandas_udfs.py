"""Arrow-batched pandas UDFs for the binary-function tail: HMAC,
IEEE 754 byte encoding, and MurmurHash3 x64 128.

Reference: presto-main-base/.../operator/scalar/HmacFunctions.java
(hmac_md5/sha1/sha256/sha512 over VARBINARY message + key) and
VarbinaryFunctions.java:250-307 (to/from_ieee754_32/64 big-endian,
murmur3_x64_128 = Guava murmur3_128, itself the public-domain
MurmurHash3_x64_128).  Docs functions/binary.rst:130-200.

Module WITHOUT ``from __future__ import annotations`` (pandas_udf needs
live type hints).  Spark has no JVM builtin for any of these; they are
credential/fingerprint expressions, never scan-hot paths, so the
Arrow-batched Python tier is the right cost point — the same reasoning
as the CDF and JSONPath fallbacks.  hashlib/hmac implement the exact
RFC 2104 construction the reference delegates to javax.crypto;
murmur3 is implemented below and pinned against the reference's own
test vectors (TestVarbinaryFunctions.java:348-349,475-501).
"""

import hashlib
import hmac as _hmac
import struct

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
)

_M64 = (1 << 64) - 1


def murmur3_x64_128(data: bytes, seed: int = 0) -> bytes:
    """MurmurHash3 x64 128 (Austin Appleby's public-domain algorithm;
    byte-compatible with Guava murmur3_128 and the C++ Murmur3F the
    reference documents at VarbinaryFunctions.java:302)."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M64

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & _M64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & _M64
        k ^= k >> 33
        return k

    length = len(data)
    h1 = h2 = seed
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], "little")
        k1 = (k1 * c1) & _M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16:]
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _M64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[: min(tl, 8)], "little")
        k1 = (k1 * c1) & _M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")


def _map_hmac(digest):
    def run(msg: pd.Series, key: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if m is None or k is None
                else _hmac.new(bytes(k), bytes(m), digest).digest()
                for m, k in zip(msg, key)
            ],
            dtype=object,
        )

    return run


hmac_md5_udf = pandas_udf(_map_hmac(hashlib.md5), BinaryType())
hmac_sha1_udf = pandas_udf(_map_hmac(hashlib.sha1), BinaryType())
hmac_sha256_udf = pandas_udf(_map_hmac(hashlib.sha256), BinaryType())
hmac_sha512_udf = pandas_udf(_map_hmac(hashlib.sha512), BinaryType())


@pandas_udf(BinaryType())
def murmur3_x64_128_udf(data: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else murmur3_x64_128(bytes(b)) for b in data],
        dtype=object,
    )


@pandas_udf(BinaryType())
def to_ieee754_64_udf(x: pd.Series) -> pd.Series:
    # Big-endian 8 bytes (VarbinaryFunctions.java:276-283).  A NaN
    # arriving in the float64 batch is encoded as IEEE NaN bytes —
    # the Arrow float64 lane cannot distinguish SQL NULL from NaN, so
    # NULL-in → NaN-bytes-out is the pinned edge here (Presto returns
    # NULL); genuine nan() inputs encode correctly.
    return pd.Series(
        [struct.pack(">d", float(v)) for v in x], dtype=object
    )


@pandas_udf(DoubleType())
def from_ieee754_64_udf(b: pd.Series) -> pd.Series:
    def dec(v):
        if v is None:
            return None
        v = bytes(v)
        if len(v) != 8:
            raise ValueError(
                "Input floating-point value must be exactly 8 bytes long")
        return struct.unpack(">d", v)[0]

    return pd.Series([dec(v) for v in b], dtype="float64")


@pandas_udf(BinaryType())
def to_ieee754_32_udf(x: pd.Series) -> pd.Series:
    # Same NaN/NULL lane pin as to_ieee754_64_udf.
    return pd.Series(
        [struct.pack(">f", float(v)) for v in x], dtype=object
    )


@pandas_udf(FloatType())
def from_ieee754_32_udf(b: pd.Series) -> pd.Series:
    def dec(v):
        if v is None:
            return None
        v = bytes(v)
        if len(v) != 4:
            raise ValueError(
                "Input floating-point value must be exactly 4 bytes long")
        return struct.unpack(">f", v)[0]

    return pd.Series([dec(v) for v in b], dtype="float32")


# ---- base32 + SpookyHash V2 (VarbinaryFunctions.java:146-163 base32,
# :385-388 spooky; SpookyHash is Bob Jenkins' public-domain V2
# algorithm, short path pinned against the reference's test vectors) ----

import base64 as _b64

_SC = 0xDEADBEEFDEADBEEF
_ROT_MIX = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
_ROT_END = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)


def _rot64(x, k):
    return ((x << k) | (x >> (64 - k))) & _M64


def _short_mix(h):
    rots = (50, 52, 30, 41, 54, 48, 38, 37, 62, 34, 5, 36)
    idx = ((2, 3, 0), (3, 0, 1), (0, 1, 2), (1, 2, 3)) * 3
    for k, (i, j, x) in zip(rots, idx):
        h[i] = _rot64(h[i], k)
        h[i] = (h[i] + h[j]) & _M64
        h[x] ^= h[i]
    return h


def _short_end(h):
    seq = ((3, 2, 15), (0, 3, 52), (1, 0, 26), (2, 1, 51), (3, 2, 28),
           (0, 3, 9), (1, 0, 47), (2, 1, 54), (3, 2, 32), (0, 3, 25),
           (1, 0, 63))
    for i, j, k in seq:
        h[i] ^= h[j]
        h[j] = _rot64(h[j], k)
        h[i] = (h[i] + h[j]) & _M64
    return h


def _u64le(b, o):
    return int.from_bytes(b[o:o + 8], "little")


def _spooky_short(msg, seed1=0, seed2=0):
    length = len(msg)
    remainder = length % 32
    h = [seed1, seed2, _SC, _SC]
    p = 0
    if length > 15:
        while length - p >= 32:
            h[2] = (h[2] + _u64le(msg, p)) & _M64
            h[3] = (h[3] + _u64le(msg, p + 8)) & _M64
            h = _short_mix(h)
            h[0] = (h[0] + _u64le(msg, p + 16)) & _M64
            h[1] = (h[1] + _u64le(msg, p + 24)) & _M64
            p += 32
        if remainder >= 16:
            h[2] = (h[2] + _u64le(msg, p)) & _M64
            h[3] = (h[3] + _u64le(msg, p + 8)) & _M64
            h = _short_mix(h)
            p += 16
            remainder -= 16
    h[3] = (h[3] + (length << 56)) & _M64
    t = msg[p:]
    r = remainder
    if r == 0:
        h[2] = (h[2] + _SC) & _M64
        h[3] = (h[3] + _SC) & _M64
    elif r >= 9:
        # the C switch falls 15→…→12 / 11→…→9→8
        d_add = 0
        if r >= 15:
            d_add += t[14] << 48
        if r >= 14:
            d_add += t[13] << 40
        if r >= 13:
            d_add += t[12] << 32
        if r >= 12:
            d_add += int.from_bytes(t[8:12], "little")
        else:
            if r >= 11:
                d_add += t[10] << 16
            if r >= 10:
                d_add += t[9] << 8
            d_add += t[8]
        h[3] = (h[3] + d_add) & _M64
        h[2] = (h[2] + _u64le(t, 0)) & _M64
    elif r == 8:
        h[2] = (h[2] + _u64le(t, 0)) & _M64
    else:
        c_add = 0
        if r >= 7:
            c_add += t[6] << 48
        if r >= 6:
            c_add += t[5] << 40
        if r >= 5:
            c_add += t[4] << 32
        if r >= 4:
            c_add += int.from_bytes(t[0:4], "little")
        else:
            if r >= 3:
                c_add += t[2] << 16
            if r >= 2:
                c_add += t[1] << 8
            c_add += t[0]
        h[2] = (h[2] + c_add) & _M64
    h = _short_end(h)
    return h[0], h[1]


def _mix(block, s):
    for i in range(12):
        s[i] = (s[i] + _u64le(block, i * 8)) & _M64
        s[(i + 2) % 12] ^= s[(i + 10) % 12]
        s[(i + 11) % 12] ^= s[i]
        s[i] = _rot64(s[i], _ROT_MIX[i])
        s[(i + 11) % 12] = (s[(i + 11) % 12] + s[(i + 1) % 12]) & _M64
    return s


def _end_partial(h):
    for i in range(12):
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _M64
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rot64(h[(i + 1) % 12], _ROT_END[i])
    return h


def spooky_hash_v2_128(msg: bytes, seed1: int = 0, seed2: int = 0):
    """SpookyHash V2 (public-domain Jenkins algorithm; the reference
    wraps airlift's port).  Short path (< 192 bytes) is pinned against
    TestVarbinaryFunctions.java:385-388; the long path follows the
    published 12-lane schedule."""
    if len(msg) < 192:
        return _spooky_short(msg, seed1, seed2)
    h = [(seed1, seed2, _SC)[i % 3] for i in range(12)]
    p = 0
    while len(msg) - p >= 96:
        h = _mix(msg[p:p + 96], h)
        p += 96
    remainder = len(msg) - p
    buf = bytearray(96)
    buf[:remainder] = msg[p:]
    buf[95] = remainder
    for i in range(12):
        h[i] = (h[i] + _u64le(buf, i * 8)) & _M64
    for _ in range(3):
        h = _end_partial(h)
    return h[0], h[1]


@pandas_udf(BinaryType())
def spooky_hash_v2_32_udf(data: pd.Series) -> pd.Series:
    def run(b):
        if b is None:
            return None
        h1, _ = spooky_hash_v2_128(bytes(b))
        return (h1 & 0xFFFFFFFF).to_bytes(4, "big")

    return pd.Series([run(b) for b in data], dtype=object)


@pandas_udf(BinaryType())
def spooky_hash_v2_64_udf(data: pd.Series) -> pd.Series:
    def run(b):
        if b is None:
            return None
        h1, _ = spooky_hash_v2_128(bytes(b))
        return h1.to_bytes(8, "big")

    return pd.Series([run(b) for b in data], dtype=object)


@pandas_udf(StringType())
def to_base32_udf(b: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else _b64.b32encode(bytes(v)).decode("ascii")
         for v in b],
        dtype=object,
    )


@pandas_udf(BinaryType())
def from_base32_udf(s: pd.Series) -> pd.Series:
    def dec(v):
        if v is None:
            return None
        return _b64.b32decode(str(v))

    return pd.Series([dec(v) for v in s], dtype=object)


# ---- FNV-1 / FNV-1a (VarbinaryFunctions.java fnv1_32/64, fnv1a_32/64;
# FnvHash.java — the draft-eastlake-fnv-17 §6 reference algorithm;
# goldens TestVarbinaryFunctions.java:415-435) ----

_FNV32_BASIS, _FNV32_PRIME = 0x811C9DC5, 0x01000193
_FNV64_BASIS, _FNV64_PRIME = 0xCBF29CE484222325, 0x100000001B3
_M32 = (1 << 32) - 1


def _fnv(data: bytes, basis: int, prime: int, mask: int, a_variant: bool) -> int:
    h = basis
    for b in data:
        if a_variant:
            h = ((h ^ b) * prime) & mask
        else:
            h = ((h * prime) & mask) ^ b
    return h


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def _fnv_udf(basis, prime, mask, bits, a_variant, dtype):
    @pandas_udf(dtype)
    def fn(data: pd.Series) -> pd.Series:
        return data.map(
            lambda d: None if d is None else _signed(
                _fnv(bytes(d), basis, prime, mask, a_variant), bits))
    return fn


# DataType objects, not DDL strings — string return types parse lazily
# and need a live session (the same import-time trap as the geo tier).
fnv1_32_udf = _fnv_udf(_FNV32_BASIS, _FNV32_PRIME, _M32, 32, False,
                       IntegerType())
fnv1_64_udf = _fnv_udf(_FNV64_BASIS, _FNV64_PRIME, _M64, 64, False,
                       LongType())
fnv1a_32_udf = _fnv_udf(_FNV32_BASIS, _FNV32_PRIME, _M32, 32, True,
                        IntegerType())
fnv1a_64_udf = _fnv_udf(_FNV64_BASIS, _FNV64_PRIME, _M64, 64, True,
                        LongType())
