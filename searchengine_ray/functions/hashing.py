"""Key hashing.

The reference keys everything with IEEE CRC32
(/root/reference/DataStructures/DataStructs/CRC32.cs:13-37, polynomial
0xEDB88320 == zlib.crc32) and tolerates collisions by returning the first
colliding record (/root/reference/DataStructures/DataStructs/Functions.cs:294-295).
The rebuild uses a 64-bit key — the concatenation of two seeded CRC32s —
so collisions are negligible even at 10^12 docs, while keeping the hash
dependency-free and C-speed (zlib). CRC32 itself is exposed for the
reference-conformance tests.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEED2 = 0x9E3779B9  # golden-ratio constant; decorrelates the second CRC
_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing multiplier


def crc32(data: bytes | str) -> int:
    """IEEE CRC32, identical to the reference's Crc32.Compute."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return zlib.crc32(data) & 0xFFFFFFFF


def hash64(data: bytes | str) -> int:
    """Stable 64-bit key: (crc32(x) << 32) | crc32(x, seed2), bit-reinterpreted
    as SIGNED int64 (Arrow/Ray groupby and DuckDB all prefer int64; uint64
    keys >= 2^63 degrade to pickled-object columns in Ray aggregations)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    hi = zlib.crc32(data) & 0xFFFFFFFF
    lo = zlib.crc32(data, _SEED2) & 0xFFFFFFFF
    h = (hi << 32) | lo
    return h - (1 << 64) if h >= 1 << 63 else h


def hash64_array(values: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """hash64 over a string column, amortized over distinct values.

    Token columns are highly repetitive (Zipf), so dictionary-encode first
    and hash only the dictionary; the per-row cost is one int32 gather.
    Returns an int64 ndarray aligned with `values`.
    """
    if isinstance(values, list):
        values = pa.array(values, type=pa.string())
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    dic = pc.dictionary_encode(values)
    uniq = dic.dictionary.to_pylist()
    table = np.fromiter(
        (hash64(u) for u in uniq), dtype=np.int64, count=len(uniq)
    )
    idx = dic.indices.to_numpy(zero_copy_only=False)
    if len(table) == 0:
        return np.zeros(0, dtype=np.int64)
    return table[idx]


def md5h64(data: bytes | str) -> int:
    """SQL-checkable 64-bit hash: first 8 bytes of md5, big-endian, signed.

    Used by the dedup contract ops (simhash/minhash/shingles) INSTEAD of
    hash64 so the DuckDB oracle can recompute it exactly:
    ('0x' || substr(md5(x), 1, 16))::UBIGINT reinterpreted as int64."""
    import hashlib

    if isinstance(data, str):
        data = data.encode("utf-8")
    h = int.from_bytes(hashlib.md5(data).digest()[:8], "big")
    return h - (1 << 64) if h >= 1 << 63 else h


def md5h64_array(values: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """md5h64 over a string column, amortized over distinct values (same
    dictionary-encode trick as hash64_array; token columns are Zipf)."""
    if isinstance(values, list):
        values = pa.array(values, type=pa.string())
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    dic = pc.dictionary_encode(values)
    uniq = dic.dictionary.to_pylist()
    table = np.fromiter((md5h64(u) for u in uniq), dtype=np.int64, count=len(uniq))
    idx = dic.indices.to_numpy(zero_copy_only=False)
    if len(table) == 0:
        return np.zeros(0, dtype=np.int64)
    return table[idx]


def mix64(x: np.ndarray) -> np.ndarray:
    """Cheap invertible mixer for integer ids (splitmix-style multiply-xor).
    Accepts signed or unsigned input; operates on the raw 64-bit pattern."""
    x = np.ascontiguousarray(x)
    x = x.view(np.uint64).copy() if x.dtype == np.int64 else x.astype(np.uint64, copy=True)
    x *= _MIX
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x


def doc_partition(doc_ids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Partition assignment for the inversion shuffle: mix(doc_id) % P.

    Doc-bucketed (not term-bucketed): every term's posting list is spread
    across all P partitions in proportion to its length, so Zipf head terms
    cannot skew a partition (see package docstring).
    """
    return (mix64(doc_ids) % np.uint64(num_partitions)).astype(np.uint32)
