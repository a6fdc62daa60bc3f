"""Pure-Python XXH64 with Spark's ``xxhash64`` semantics.

Catalyst's ``xxhash64(e1, e2, ...)`` folds the arguments left to right:
the running hash starts at seed 42 and each argument is hashed WITH THE
RUNNING HASH AS ITS SEED (strings as their UTF-8 bytes, integral types
as 4/8-byte specializations). Having the same function in plain Python
lets in-closure operators (``mapInPandas`` scorers that must run on
streams) reproduce engine-side bucket assignments bit-for-bit — the
parity is asserted against live Catalyst expressions in
``tests/test_xxh.py``.

The XXH64 algorithm is public (Yann Collet, xxhash.com, BSD); the
constants and the int/long specializations below follow the published
spec, matching Spark's ``org.apache.spark.sql.catalyst.expressions.XXH64``.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


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
    """XXH64 of one 8-byte long (Spark's ``hashLong``)."""
    value &= _M
    h = (seed + _P5 + 8) & _M
    k1 = _rotl((value * _P2) & _M, 31)
    k1 = (k1 * _P1) & _M
    h ^= k1
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int (Spark's ``hashInt``)."""
    value &= 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (value * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (Spark's ``hashUnsafeBytes`` — the
    standard streaming XXH64 over 32-byte stripes, then 8/4/1-byte
    tails)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M, 31) * _P1) & _M
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M, 31) * _P1) & _M
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M, 31) * _P1) & _M
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            k1 = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ k1) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        k1 = (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((k * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M), 11)) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """Replicate ``F.xxhash64(v1, v2, ...)``: fold each value into the
    running hash (which seeds the next). Supports str (UTF-8 bytes),
    bytes, bool and int (Python ints ≤ 32 bits hash as Spark INT —
    matching ``F.lit`` typing — larger as LONG; pass ``("long", v)`` to
    force the 8-byte path). Returns Spark's SIGNED 64-bit value.
    """
    h = seed
    for v in values:
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "long":
            h = hash_long(int(v[1]), h)
        elif isinstance(v, bool):
            h = hash_int(1 if v else 0, h)
        elif isinstance(v, int):
            if -(2**31) <= v < 2**31:
                h = hash_int(v, h)
            else:
                h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = hash_bytes(v, h)
        elif v is None:
            continue  # Catalyst skips NULL inputs (hash unchanged)
        else:
            raise TypeError(f"unsupported type {type(v)!r}")
    return _to_signed(h)
