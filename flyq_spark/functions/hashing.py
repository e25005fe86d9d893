"""Pure-Python XXH64 — bit-compatible with Spark's ``F.xxhash64``.

Spark's ``xxhash64`` is XXH64 with seed 42 over the raw bytes (for
BinaryType columns). Having the identical hash driver-side lets the
engine route a single key without launching a Spark job
(``FlyQEngine.consume_by_key``) and lets tests pin the routing function
bit-for-bit (tests/test_codec_config.py parity test vs F.xxhash64).

Standard public XXH64 algorithm (Yann Collet's xxHash, BSD): four lane
accumulators over 32-byte stripes, tail mixing, avalanche finalization.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Unsigned 64-bit XXH64 digest."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while pos + 32 <= n:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1, v2, v3, v4 = _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d)
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Signed two's-complement view — exactly what F.xxhash64 returns."""
    u = xxh64(data, seed)
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_partition_for_key(key: bytes, n_partitions: int) -> int:
    """Driver-side replica of the engine's default keyed routing:
    ``pmod(xxhash64(key), n)`` (operators/routing.py). Python's % on the
    signed value is already the positive remainder, matching Spark pmod."""
    return xxh64_signed(key) % n_partitions
