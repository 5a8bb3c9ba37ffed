"""Spark-compatible xxHash64 in pure Python (stdlib only).

Spark's ``xxhash64()`` expression (seed 42) drives the engine's bucket
layout: ``bucket = pmod(xxhash64(key), num_buckets)``. Re-implementing
the public XXH64 algorithm here (spec: github.com/Cyan4973/xxHash,
public domain) makes the bucket function computable OUTSIDE Spark —
the driver plans point lookups without a job, and the Spark-free
DuckDB writer/reader (lake/interop.py) can place and prune rows by
key. Spark hashes a LONG column as its 8-byte little-endian value and
a STRING column as its UTF-8 bytes (XxHash64Function.hashLong /
hashUnsafeBytes); both reduce to plain XXH64 over those bytes, which
``spark_xxhash64`` reproduces bit-for-bit (pinned against Spark in
tests/test_xxh.py).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` → UNSIGNED 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + k1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + k2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + k3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + k4 * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# Column types Spark's XxHash64 expression feeds through the 4-byte
# hashInt path (XXH64 over the value's 4-byte little-endian encoding;
# byte/short are widened to int first) vs the 8-byte hashLong path.
_INT_TYPES = frozenset({"int", "integer", "smallint", "tinyint", "date"})
_LONG_TYPES = frozenset({"bigint", "long", "timestamp"})


def spark_xxhash64(value, seed: int = 42, coltype: str | None = None) -> int:
    """Spark's ``xxhash64(value)`` → SIGNED 64-bit int (what the
    expression returns). ``coltype`` is the DECLARED lake column type
    ('string' | 'bigint' | 'int' | ...); it matters because Spark
    hashes an IntegerType column via the 4-byte hashInt path but a
    LongType column via the 8-byte hashLong path — the same Python int
    hashes DIFFERENTLY depending on the column's type. Callers that
    know the column type must pass it; the legacy default (None) infers
    str→UTF-8 bytes and int→8-byte long, which is only correct for
    string/bigint columns."""
    if value is None:
        # Spark: a NULL input leaves the running hash at the seed
        return seed - (1 << 64) if seed >= (1 << 63) else seed
    if isinstance(value, bool):
        raise TypeError("boolean bucket keys are not supported")
    if coltype is not None:
        t = coltype.lower()
        if t in ("string", "varchar"):
            if not isinstance(value, str):
                raise TypeError(f"string column got {type(value).__name__}")
            data = value.encode("utf-8")
        elif t in _LONG_TYPES:
            if not isinstance(value, int):
                raise TypeError(f"{t} column got {type(value).__name__}")
            data = struct.pack("<q", value)
        elif t in _INT_TYPES:
            if not isinstance(value, int):
                raise TypeError(f"{t} column got {type(value).__name__}")
            # Spark XXH64.hashInt == XXH64 of the 4-byte LE encoding
            data = struct.pack("<i", value)
        else:
            raise TypeError(f"no Spark hash mapping for column type {t!r}")
    elif isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, int):
        data = struct.pack("<q", value)
    elif isinstance(value, (bytes, bytearray)):
        data = bytes(value)
    else:
        raise TypeError(f"no Spark hash mapping for {type(value).__name__}")
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(value, num_buckets: int, seed: int = 42, coltype: str | None = None) -> int:
    """``pmod(xxhash64(value), num_buckets)`` — the engine's bucket
    function, Spark-free. Python's ``%`` on a signed int IS pmod."""
    return spark_xxhash64(value, seed, coltype=coltype) % num_buckets
