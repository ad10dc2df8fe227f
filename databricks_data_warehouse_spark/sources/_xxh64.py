"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Why this exists: the Python Data Source's ``partitions()`` hook runs in
a planning subprocess with NO SparkSession, so the bloom index's
prune-side literal hashing (normally one tiny Spark job in
``ManagedTable._bloom_positions``) needs a driver-independent
implementation that is BIT-IDENTICAL to what the write side computed
with ``F.xxhash64`` — otherwise the pushdown path would probe the wrong
bit positions and wrongly prune.

Spark evaluates ``xxhash64(c1, c2, …)`` as a left fold with seed 42:
``h = 42; h = hash_<type>(c1, h); h = hash_<type>(c2, h); …`` where
integral types ≤ 4 bytes hash through the 4-byte finalizer
(``hash_int``), longs (and timestamps as epoch-micros, doubles as raw
bits) through the 8-byte finalizer (``hash_long``), and strings through
the full streaming algorithm over their UTF-8 bytes (``hash_bytes``).
Dates hash as epoch-days through ``hash_int``. The algorithm constants
and structure are the public XXH64 specification; equality with Spark
is property-tested (tests/test_xxh64.py) over random values of every
supported type.
"""

from __future__ import annotations

import datetime

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """8-byte input path (LongType / TimestampType micros / raw double
    bits)."""
    value &= _M
    h = (seed + _P5 + 8) & _M
    k = (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """4-byte input path (Byte/Short/Integer/Date-days/Boolean)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (StringType → UTF-8 bytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def hash_value(value, simple_type: str, seed: int) -> int | None:
    """One fold step of Spark's ``xxhash64`` for a typed value, or None
    when the type isn't supported here (caller must then skip — never
    guess)."""
    if value is None:
        return seed  # Spark skips null inputs (seed passes through)
    if simple_type in ("tinyint", "smallint", "int"):
        return hash_int(int(value), seed)
    if simple_type == "boolean":
        return hash_int(1 if value else 0, seed)
    if simple_type == "bigint":
        return hash_long(int(value), seed)
    if simple_type == "date":
        if isinstance(value, datetime.date):
            days = (value - datetime.date(1970, 1, 1)).days
            return hash_int(days, seed)
        return None
    if simple_type == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    return None


def signed(h: int) -> int:
    """The unsigned 64-bit hash as Spark's signed long."""
    return h - (1 << 64) if h >= (1 << 63) else h
