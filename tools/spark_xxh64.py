"""Pure-Python XXH64 matching Spark's `xxhash64(...)` expression.

Why this exists: the MinHash-LSH and SimHash operators key on Spark's
built-in ``xxhash64`` (seed 42), which DuckDB does not ship — so those
queries were driver-verified rows-only. Registering THIS module's
functions as DuckDB Python UDFs lets ``tools/replay_tiers.py`` replay
the full pipelines cross-engine and upgrade them to sweep-tier MATCH
records (VERDICT r09 #3).

Everything here derives from public sources only: the xxHash64
reference specification (Yann Collet, github.com/Cyan4973/xxHash —
BSD) and the public Apache Spark source semantics of the `XxHash64`
expression (sql/catalyst hash expressions): a multi-argument call
CHAINS — the running hash seeds the next field's hash — starting from
seed 42; IntegerType fields hash via the 4-byte primitive finalizer,
LongType via the 8-byte one, StringType via streaming XXH64 over the
UTF-8 bytes. Results are SIGNED 64-bit (Java long).

Parity with the live Spark session is pinned by
tests/test_oracle_parity.py::test_python_xxh64_matches_spark — if a
Spark upgrade ever changed the expression, that test (not a silent
sweep divergence) fails.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Unsigned XXH64 of ``data`` — the reference streaming algorithm,
    identical to Spark's hashUnsafeBytesBlock over a UTF8String."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt — 4-byte primitive path (IntegerType field)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong — 8-byte primitive path (LongType field)."""
    h = (seed + _P5 + 8) & _M64
    h ^= _round(0, value & _M64)
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


_SPARK_SEED = 42


def spark_xxhash64_str(s: str) -> int:
    """= Spark ``xxhash64(s)`` for a string column (signed long)."""
    return _signed(xxh64_bytes(s.encode("utf-8"), _SPARK_SEED))


def spark_xxhash64_long(value: int) -> int:
    """= Spark ``xxhash64(col)`` for a LongType column (signed long)."""
    return _signed(hash_long(value, _SPARK_SEED))


def spark_xxhash64_int_str(i: int, s: str) -> int:
    """= Spark ``xxhash64(lit(i), s)`` — int field, then string field."""
    return _signed(xxh64_bytes(s.encode("utf-8"), hash_int(i, _SPARK_SEED)))


def spark_xxhash64_str_int(s: str, i: int) -> int:
    """= Spark ``xxhash64(s, lit(i))`` — string field, then int field."""
    return _signed(hash_int(i, xxh64_bytes(s.encode("utf-8"), _SPARK_SEED)))
