"""Vectorized 64-bit Hamming distance.

Semantics of /root/reference/src/main/java/hash/Hamming.java:4-6
(``Long.bitCount(a ^ b)``) on unsigned uint64 numpy arrays. numpy 1.26
has no ``bitwise_count``; popcount is a uint8-view table lookup.
"""

from __future__ import annotations

import numpy as np

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """uint64 array (any shape) -> per-element popcount, int32."""
    x = np.asarray(x, dtype=np.uint64)
    shape = x.shape
    b = np.ascontiguousarray(x.reshape(-1)).view(np.uint8).reshape(-1, 8)
    return _POP8[b].sum(axis=-1, dtype=np.int32).reshape(shape)


def hamming_distance(a, b) -> np.ndarray | int:
    """Elementwise Hamming distance between uint64 scalars/arrays."""
    xa = np.asarray(a, dtype=np.uint64)
    xb = np.asarray(b, dtype=np.uint64)
    d = popcount64(np.bitwise_xor(xa, xb))
    return int(d) if d.ndim == 0 else d


def pairwise_hamming(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """(n,) x (m,) uint64 -> (n, m) int32 distance matrix, row-chunked."""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty((a.size, b.size), dtype=np.int32)
    for i in range(0, a.size, chunk):
        out[i : i + chunk] = popcount64(np.bitwise_xor(a[i : i + chunk, None], b[None, :]))
    return out
