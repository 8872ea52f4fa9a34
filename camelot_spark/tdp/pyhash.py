"""Pure-Python mirror of Spark SQL's ``xxhash64`` expression.

XXH64 is a public algorithm (Yann Collet's xxHash, BSD); Spark's
``XxHash64`` expression applies it per argument with the running hash
as the seed, starting from seed 42, using the streaming block layout
for fixed-width types (a 4-byte block for INT, an 8-byte block for
BIGINT) and the byte-array layout for strings (UTF-8 bytes).

This module exists so the four production dedup queries — whose hash
family no SQL engine reproduces — can get expected-values oracles: the
driver compares the Spark pipeline's output against pair sets computed
from scratch here (see ``__spark_entry__._prod_dedup_expected``).
Exactness against Spark is pinned by
tests/test_round6.py::TestPyXXH64 across strings (all tail-length
classes incl. >=32-byte block loops), INT and BIGINT chaining.
"""
from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        vs = [v1, v2, v3, v4]
        while i <= n - 32:
            for idx in range(4):
                k = int.from_bytes(data[i + idx * 8:i + idx * 8 + 8],
                                   "little")
                v = (vs[idx] + k * _P2) & _M
                vs[idx] = (_rotl(v, 31) * _P1) & _M
            i += 32
        v1, v2, v3, v4 = vs
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in vs:
            k = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h ^= k
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int(i32: int, seed: int) -> int:
    """Spark XXH64.hashInt: one 4-byte block (INT arguments)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i32 & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_long(i64: int, seed: int) -> int:
    """Spark XXH64.hashLong: one 8-byte block (BIGINT arguments)."""
    h = (seed + _P5 + 8) & _M
    k = (_rotl(((i64 & _M) * _P2) & _M, 31) * _P1) & _M
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def to_signed(x: int) -> int:
    """Unsigned 64-bit pattern -> Spark's signed BIGINT value."""
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """``F.xxhash64(string_col)`` (signed)."""
    return to_signed(xxh64_bytes(s.encode("utf-8"), seed))


def spark_xxhash64_str_int(s: str, k: int, seed: int = 42) -> int:
    """``F.xxhash64(string_col, F.lit(k))`` with an INT literal
    (signed). The string hashes first; its running hash seeds the
    4-byte int block."""
    return to_signed(xxh64_int(k, xxh64_bytes(s.encode("utf-8"), seed)))
