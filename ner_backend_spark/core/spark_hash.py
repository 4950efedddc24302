"""Pure-Python replicas of Spark's ``hash`` (Murmur3 x86_32) and ``xxhash64``.

Why this exists: the materialized pure-Python oracles (tools/gen_oracles.py)
must reproduce the engine's LSH banding, MinHash bucketing and mention-id
assignment *bit-exactly*, and those all key off Spark's built-in hash
expressions. These functions mirror
``org.apache.spark.sql.catalyst.expressions.Murmur3Hash`` /
``XxHash64`` semantics:

* multi-column hashing folds left with the running hash as the next seed,
  starting from seed 42;
* IntegerType hashes as a 4-byte int, LongType as two 32-bit halves
  (Murmur3) / one 8-byte block (XXH64);
* StringType hashes the UTF-8 bytes via ``hashUnsafeBytes``: 4-byte
  little-endian words, then remaining bytes one at a time as *signed* ints.

Each replica is pinned against the real Spark expressions in
tests/test_spark_hash.py (strings incl. unicode, negative ints/longs,
arrays, multi-column folds).
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------------------
# Murmur3 x86_32 (Spark `hash(...)`, default seed 42)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    return h1 ^ (h1 >> 16)


def _signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _signed64(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


def murmur3_int(value: int, seed: int) -> int:
    """Murmur3_x86_32.hashInt — returns the *unsigned* 32-bit hash."""
    return _fmix(_mix_h1(seed & _M32, _mix_k1(value & _M32)), 4)


def murmur3_long(value: int, seed: int) -> int:
    """Murmur3_x86_32.hashLong: low 32 bits then high 32 bits."""
    v = value & _M64
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    return _fmix(h1, 8)


def murmur3_bytes(data: bytes, seed: int) -> int:
    """Murmur3_x86_32.hashUnsafeBytes: LE 4-byte words + signed tail bytes."""
    n = len(data)
    aligned = n - n % 4
    h1 = seed & _M32
    for off in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[off : off + 4], "little")))
    for i in range(aligned, n):
        b = data[i]
        if b >= 0x80:
            b -= 0x100  # Java byte is signed; int promotion sign-extends
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _fmix(h1, n)


def spark_hash(*values, seed: int = 42) -> int:
    """Spark ``hash(col1, col2, ...)`` -> signed int32.

    Supported value types: int (int32 range -> hashInt, else hashLong —
    pass ('long', v) / ('int', v) tuples to force), str (UTF-8 bytes),
    bytes, and list (array: fold elements with the running hash as seed;
    element type inferred the same way). Matches HashExpression.eval.
    """
    h = seed & _M32
    for v in values:
        h = _hash_one_m3(v, h)
    return _signed32(h)


def _hash_one_m3(v, seed: int) -> int:
    if isinstance(v, tuple) and len(v) == 2 and v[0] in ("int", "long"):
        kind, val = v
        return murmur3_int(val, seed) if kind == "int" else murmur3_long(val, seed)
    if isinstance(v, bool):
        return murmur3_int(1 if v else 0, seed)
    if isinstance(v, int):
        if -(1 << 31) <= v < (1 << 31):
            return murmur3_int(v, seed)
        return murmur3_long(v, seed)
    if isinstance(v, str):
        return murmur3_bytes(v.encode("utf-8"), seed)
    if isinstance(v, (bytes, bytearray)):
        return murmur3_bytes(bytes(v), seed)
    if isinstance(v, list):
        h = seed
        for elem in v:
            h = _hash_one_m3(elem, h)
        return h
    raise TypeError(f"unsupported type for spark_hash: {type(v)!r}")


def spark_hash_int_array(values: list[int], seed: int = 42) -> int:
    """hash(array<int>) -> signed int32 (each element via hashInt)."""
    h = seed & _M32
    for v in values:
        h = murmur3_int(v, h)
    return _signed32(h)


def spark_hash_long_array(values: list[int], seed: int = 42) -> int:
    """hash(array<long>) -> signed int32 (each element via hashLong)."""
    h = seed & _M32
    for v in values:
        h = murmur3_long(v, h)
    return _signed32(h)


# ---------------------------------------------------------------------------
# XXH64 (Spark `xxhash64(...)`, default seed 42)

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh_round(acc: int, value: int) -> int:
    acc = (acc + value * _P2) & _M64
    acc = _rotl64(acc, 31)
    return (acc * _P1) & _M64


def _xxh_merge(h: int, v: int) -> int:
    h ^= _xxh_round(0, v)
    return (h * _P1 + _P4) & _M64


def _xxh_avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    return h ^ (h >> 32)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 over bytes (unsigned result), matching Spark's XXH64 class."""
    n = len(data)
    seed &= _M64
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _xxh_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        h = _xxh_merge(h, v1)
        h = _xxh_merge(h, v2)
        h = _xxh_merge(h, v3)
        h = _xxh_merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _xxh_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    return _xxh_avalanche(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64.hashLong — one 8-byte block."""
    h = ((seed & _M64) + _P5 + 8) & _M64
    h ^= _xxh_round(0, value & _M64)
    h = (_rotl64(h, 27) * _P1 + _P4) & _M64
    return _xxh_avalanche(h)


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Spark ``xxhash64(col1, col2, ...)`` -> signed int64 (left fold)."""
    h = seed & _M64
    for v in values:
        h = _hash_one_xxh(v, h)
    return _signed64(h)


def _hash_one_xxh(v, seed: int) -> int:
    if isinstance(v, tuple) and len(v) == 2 and v[0] in ("int", "long"):
        # force the column type: a LONG column hashes via hashLong even for
        # values that fit in int32 (same contract as spark_hash)
        kind, val = v
        return _xxh_int(val, seed) if kind == "int" else xxh64_long(val, seed)
    if isinstance(v, bool):
        return _xxh_int(1 if v else 0, seed)
    if isinstance(v, int):
        if -(1 << 31) <= v < (1 << 31):
            return _xxh_int(v, seed)
        return xxh64_long(v, seed)
    if isinstance(v, str):
        return xxh64_bytes(v.encode("utf-8"), seed)
    if isinstance(v, (bytes, bytearray)):
        return xxh64_bytes(bytes(v), seed)
    if isinstance(v, list):
        h = seed
        for elem in v:
            h = _hash_one_xxh(elem, h)
        return h
    raise TypeError(f"unsupported type for spark_xxhash64: {type(v)!r}")


def _xxh_int(value: int, seed: int) -> int:
    """XXH64.hashInt — one 4-byte block (sign pattern preserved as u32)."""
    h = ((seed & _M64) + _P5 + 4) & _M64
    h ^= ((value & _M32) * _P1) & _M64
    h = (_rotl64(h, 23) * _P2 + _P3) & _M64
    return _xxh_avalanche(h)
