"""Varbyte (LEB128-style) codec, numpy-vectorized.

The reference stores postings as raw fixed-width (uint32, uint32) pairs
(/root/reference/File Structures, /root/reference/Indexer/Program.cs:449-468).
The rebuild compresses posting lists as delta + varbyte per the north star;
this module is the pure codec: encode/decode whole uint64 arrays with no
Python loop over values (the encode loop is over BYTE SLOTS, max 10
iterations regardless of array length).

Format: little-endian base-128; low 7 bits per byte, high bit = "more
bytes follow".
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(0x7F)
_MAX_BYTES = 10  # ceil(64 / 7)


def varbyte_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (int64 ndarray)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nb += v >= np.uint64(1) << np.uint64(7 * k)
    return nb


def varbyte_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 array. Returns (buffer, per-value byte sizes)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nb = varbyte_sizes(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nb.max())):
        m = nb > j
        chunk = ((v[m] >> np.uint64(7 * j)) & _U7).astype(np.uint8)
        cont = (nb[m] - 1 > j).astype(np.uint8) << 7
        out[starts[m] + j] = chunk | cont
    return out.tobytes(), nb


def varbyte_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a varbyte buffer back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    cont = (b & 0x80) != 0
    payload = (b & _U7.astype(np.uint8)).astype(np.uint64)
    value_ends = np.flatnonzero(~cont)
    starts = np.empty(len(value_ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = value_ends[:-1] + 1
    lengths = value_ends - starts + 1
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lengths)
    shifted = payload << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(shifted, starts)
