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
from pyspark.sql.types import BinaryType, DoubleType, FloatType

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
