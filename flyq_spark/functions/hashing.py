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


# --------------------------------------------------------------------- #
# XXH3-64 — the reference's routing hash (topic.rs:90-93 uses
# xxhash_rust::xxh3::xxh3_64, i.e. XXH3_64bits, seed 0, default secret).
# Implemented from the public XXH3 algorithm (Yann Collet's xxHash, BSD)
# so ``method="xxh3"`` routing is bit-exact without the optional xxhash
# package. Pinned in tests/test_codec_config.py: the published
# empty-input vector, per-length-class regression vectors, and agreement
# with the C-extension xxhash package whenever it IS installed.
# --------------------------------------------------------------------- #

_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_MX1 = 0x165667919E3779F9
_MX2 = 0x9FB21C651E98DF25

# xxhash.h XXH3_kSecret — 192 public constant bytes
_KSECRET = bytes(
    [
        0xB8, 0xFE, 0x6C, 0x39, 0x23, 0xA4, 0x4B, 0xBE, 0x7C, 0x01, 0x81, 0x2C, 0xF7, 0x21, 0xAD, 0x1C,
        0xDE, 0xD4, 0x6D, 0xE9, 0x83, 0x90, 0x97, 0xDB, 0x72, 0x40, 0xA4, 0xA4, 0xB7, 0xB3, 0x67, 0x1F,
        0xCB, 0x79, 0xE6, 0x4E, 0xCC, 0xC0, 0xE5, 0x78, 0x82, 0x5A, 0xD0, 0x7D, 0xCC, 0xFF, 0x72, 0x21,
        0xB8, 0x08, 0x46, 0x74, 0xF7, 0x43, 0x24, 0x8E, 0xE0, 0x35, 0x90, 0xE6, 0x81, 0x3A, 0x26, 0x4C,
        0x3C, 0x28, 0x52, 0xBB, 0x91, 0xC3, 0x00, 0xCB, 0x88, 0xD0, 0x65, 0x8B, 0x1B, 0x53, 0x2E, 0xA3,
        0x71, 0x64, 0x48, 0x97, 0xA2, 0x0D, 0xF9, 0x4E, 0x38, 0x19, 0xEF, 0x46, 0xA9, 0xDE, 0xAC, 0xD8,
        0xA8, 0xFA, 0x76, 0x3F, 0xE3, 0x9C, 0x34, 0x3F, 0xF9, 0xDC, 0xBB, 0xC7, 0xC7, 0x0B, 0x4F, 0x1D,
        0x8A, 0x51, 0xE0, 0x4B, 0xCD, 0xB4, 0x59, 0x31, 0xC8, 0x9F, 0x7E, 0xC9, 0xD9, 0x78, 0x73, 0x64,
        0xEA, 0xC5, 0xAC, 0x83, 0x34, 0xD3, 0xEB, 0xC3, 0xC5, 0x81, 0xA0, 0xFF, 0xFA, 0x13, 0x63, 0xEB,
        0x17, 0x0D, 0xDD, 0x51, 0xB7, 0xF0, 0xDA, 0x49, 0xD3, 0x16, 0x55, 0x26, 0x29, 0xD4, 0x68, 0x9E,
        0x2B, 0x16, 0xBE, 0x58, 0x7D, 0x47, 0xA1, 0xFC, 0x8F, 0xF8, 0xB8, 0xD1, 0x7A, 0xD0, 0x31, 0xCE,
        0x45, 0xCB, 0x3A, 0x8F, 0x95, 0x16, 0x04, 0x28, 0xAF, 0xD7, 0xFB, 0xCA, 0xBB, 0x4B, 0x40, 0x7E,
    ]
)


def _le64(b: bytes, off: int) -> int:
    return struct.unpack_from("<Q", b, off)[0]


def _le32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _swap32(x: int) -> int:
    return struct.unpack("<I", struct.pack(">I", x))[0]


def _swap64(x: int) -> int:
    return struct.unpack("<Q", struct.pack(">Q", x))[0]


def _avalanche64(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _avalanche3(h: int) -> int:
    h ^= h >> 37
    h = (h * _MX1) & _MASK
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl(h, 49) ^ _rotl(h, 24)
    h = (h * _MX2) & _MASK
    h ^= (h >> 35) + length
    h &= _MASK
    h = (h * _MX2) & _MASK
    h ^= h >> 28
    return h


def _mul128_fold64(a: int, b: int) -> int:
    p = a * b
    return (p & _MASK) ^ (p >> 64)


def _mix16(data: bytes, doff: int, secret: bytes, soff: int, seed: int) -> int:
    lo = _le64(data, doff) ^ ((_le64(secret, soff) + seed) & _MASK)
    hi = _le64(data, doff + 8) ^ ((_le64(secret, soff + 8) - seed) & _MASK)
    return _mul128_fold64(lo, hi)


def _xxh3_len_0to16(data: bytes, seed: int) -> int:
    n = len(data)
    if n == 0:
        return _avalanche64(
            (seed ^ _le64(_KSECRET, 56) ^ _le64(_KSECRET, 64)) & _MASK
        )
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combined = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        bitflip = ((_le32(_KSECRET, 0) ^ _le32(_KSECRET, 4)) + seed) & _MASK
        return _avalanche64(combined ^ bitflip)
    if n <= 8:
        seed ^= (_swap32(seed & 0xFFFFFFFF) << 32) & _MASK
        i1, i2 = _le32(data, 0), _le32(data, n - 4)
        bitflip = ((_le64(_KSECRET, 8) ^ _le64(_KSECRET, 16)) - seed) & _MASK
        keyed = (i2 + (i1 << 32)) ^ bitflip
        return _rrmxmx(keyed, n)
    bitflip1 = ((_le64(_KSECRET, 24) ^ _le64(_KSECRET, 32)) + seed) & _MASK
    bitflip2 = ((_le64(_KSECRET, 40) ^ _le64(_KSECRET, 48)) - seed) & _MASK
    lo = _le64(data, 0) ^ bitflip1
    hi = _le64(data, n - 8) ^ bitflip2
    acc = (n + _swap64(lo) + hi + _mul128_fold64(lo, hi)) & _MASK
    return _avalanche3(acc)


def _xxh3_len_17to128(data: bytes, seed: int) -> int:
    n = len(data)
    acc = (n * _P1) & _MASK
    if n > 32:
        if n > 64:
            if n > 96:
                acc = (acc + _mix16(data, 48, _KSECRET, 96, seed)) & _MASK
                acc = (acc + _mix16(data, n - 64, _KSECRET, 112, seed)) & _MASK
            acc = (acc + _mix16(data, 32, _KSECRET, 64, seed)) & _MASK
            acc = (acc + _mix16(data, n - 48, _KSECRET, 80, seed)) & _MASK
        acc = (acc + _mix16(data, 16, _KSECRET, 32, seed)) & _MASK
        acc = (acc + _mix16(data, n - 32, _KSECRET, 48, seed)) & _MASK
    acc = (acc + _mix16(data, 0, _KSECRET, 0, seed)) & _MASK
    acc = (acc + _mix16(data, n - 16, _KSECRET, 16, seed)) & _MASK
    return _avalanche3(acc)


def _xxh3_len_129to240(data: bytes, seed: int) -> int:
    n = len(data)
    acc = (n * _P1) & _MASK
    for i in range(8):
        acc = (acc + _mix16(data, 16 * i, _KSECRET, 16 * i, seed)) & _MASK
    acc = _avalanche3(acc)
    for i in range(8, n // 16):
        acc = (acc + _mix16(data, 16 * i, _KSECRET, 16 * (i - 8) + 3, seed)) & _MASK
    acc = (acc + _mix16(data, n - 16, _KSECRET, 136 - 17, seed)) & _MASK
    return _avalanche3(acc)


def _xxh3_custom_secret(seed: int) -> bytes:
    out = bytearray(192)
    for i in range(12):
        lo = (_le64(_KSECRET, 16 * i) + seed) & _MASK
        hi = (_le64(_KSECRET, 16 * i + 8) - seed) & _MASK
        struct.pack_into("<QQ", out, 16 * i, lo, hi)
    return bytes(out)


def _accumulate512(acc: list[int], data: bytes, doff: int, secret: bytes, soff: int) -> None:
    for i in range(8):
        val = _le64(data, doff + 8 * i)
        key = val ^ _le64(secret, soff + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + val) & _MASK
        acc[i] = (acc[i] + (key & 0xFFFFFFFF) * (key >> 32)) & _MASK


def _xxh3_long(data: bytes, secret: bytes) -> int:
    n = len(data)
    stripes_per_block = (len(secret) - 64) // 8  # 16 for the 192 B secret
    block_len = 64 * stripes_per_block
    nb_blocks = (n - 1) // block_len
    acc = [_P32_3, _P1, _P2, _P3, _P4, _P32_2, _P5, _P32_1]
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            _accumulate512(acc, data, b * block_len + 64 * s, secret, 8 * s)
        # scramble with the secret's last 64 bytes
        for i in range(8):
            a = acc[i] ^ (acc[i] >> 47) ^ _le64(secret, len(secret) - 64 + 8 * i)
            acc[i] = (a * _P32_1) & _MASK
    nb_stripes = ((n - 1) - block_len * nb_blocks) // 64
    for s in range(nb_stripes):
        _accumulate512(acc, data, nb_blocks * block_len + 64 * s, secret, 8 * s)
    _accumulate512(acc, data, n - 64, secret, len(secret) - 64 - 7)
    result = (n * _P1) & _MASK
    for i in range(4):
        result = (
            result
            + _mul128_fold64(
                acc[2 * i] ^ _le64(secret, 11 + 16 * i),
                acc[2 * i + 1] ^ _le64(secret, 11 + 16 * i + 8),
            )
        ) & _MASK
    return _avalanche3(result)


def xxh3_64(data: bytes, seed: int = 0) -> int:
    """Unsigned XXH3-64 digest (one-shot; default secret, any seed)."""
    n = len(data)
    if n <= 16:
        return _xxh3_len_0to16(data, seed)
    if n <= 128:
        return _xxh3_len_17to128(data, seed)
    if n <= 240:
        return _xxh3_len_129to240(data, seed)
    secret = _KSECRET if seed == 0 else _xxh3_custom_secret(seed)
    return _xxh3_long(data, secret)


def flyq_partition_for_key(key: bytes, n_partitions: int) -> int:
    """Bit-exact replica of the reference's keyed routing
    (topic.rs:90-93): ``xxh3_64(key) as u32 % partition_count``."""
    return (xxh3_64(key) & 0xFFFFFFFF) % n_partitions


# --------------------------------------------------------------------- #
# XXH32 — the reference's frame checksum (flyq-protocol/src/frame.rs:50
# uses xxh32(payload, 0)). Implemented from the public xxHash spec
# (https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md),
# pinned on published test vectors in tests/test_wire_protocol.py.
# --------------------------------------------------------------------- #

_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P32_4 = 0x27D4EB2F
_P32_5 = 0x165667B1
_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def xxh32(data: bytes, seed: int = 0) -> int:
    """Unsigned XXH32 one-shot digest."""
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + _P32_1 + _P32_2) & _MASK32
        a2 = (seed + _P32_2) & _MASK32
        a3 = seed & _MASK32
        a4 = (seed - _P32_1) & _MASK32
        while pos + 16 <= n:
            a1 = (_rotl32((a1 + _le32(data, pos) * _P32_2) & _MASK32, 13) * _P32_1) & _MASK32
            a2 = (_rotl32((a2 + _le32(data, pos + 4) * _P32_2) & _MASK32, 13) * _P32_1) & _MASK32
            a3 = (_rotl32((a3 + _le32(data, pos + 8) * _P32_2) & _MASK32, 13) * _P32_1) & _MASK32
            a4 = (_rotl32((a4 + _le32(data, pos + 12) * _P32_2) & _MASK32, 13) * _P32_1) & _MASK32
            pos += 16
        h = (_rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12) + _rotl32(a4, 18)) & _MASK32
    else:
        h = (seed + _P32_5) & _MASK32
    h = (h + n) & _MASK32
    while pos + 4 <= n:
        h = (_rotl32((h + _le32(data, pos) * _P32_3) & _MASK32, 17) * _P32_4) & _MASK32
        pos += 4
    while pos < n:
        h = (_rotl32((h + data[pos] * _P32_5) & _MASK32, 11) * _P32_1) & _MASK32
        pos += 1
    h ^= h >> 15
    h = (h * _P32_2) & _MASK32
    h ^= h >> 13
    h = (h * _P32_3) & _MASK32
    h ^= h >> 16
    return h
