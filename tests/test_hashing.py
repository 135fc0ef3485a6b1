from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from searchengine_ray.functions.hashing import (
    crc32,
    doc_partition,
    hash64,
    hash64_array,
    mix64,
)


def test_crc32_matches_reference_polynomial():
    # The reference's table-driven CRC32 uses poly 0xEDB88320 / init 0xFFFFFFFF
    # (/root/reference/DataStructures/DataStructs/CRC32.cs:13-37) == zlib.crc32.
    assert crc32("hello") == zlib.crc32(b"hello")
    assert crc32(b"") == 0


def test_hash64_structure():
    h = hash64("abc")
    assert (h & 0xFFFFFFFFFFFFFFFF) >> 32 == zlib.crc32(b"abc")
    assert h != hash64("abd")
    assert -(2**63) <= h < 2**63  # signed int64 (Arrow/DuckDB-native)


def test_hash64_array_matches_scalar():
    words = ["a", "b", "a", "the", "zzz", "a"]
    arr = hash64_array(pa.array(words))
    assert arr.dtype == np.int64
    assert arr.tolist() == [hash64(w) for w in words]
    assert len(hash64_array(pa.array([], pa.string()))) == 0


def test_doc_partition_uniform_and_deterministic():
    ids = np.arange(100_000, dtype=np.int64)
    parts = doc_partition(ids, 16)
    counts = np.bincount(parts, minlength=16)
    assert parts.min() >= 0 and parts.max() < 16
    # doc-bucketing must be near-uniform (this IS the skew story)
    assert counts.max() / counts.min() < 1.1
    np.testing.assert_array_equal(parts, doc_partition(ids, 16))
    assert not np.array_equal(mix64(ids)[:10], ids[:10])
