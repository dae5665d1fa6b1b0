"""MinHash signatures + LSH band keys over caption shingles (axis B).

Candidate source J2 (SURVEY §2.5): word-k-shingles -> k MinHash values
-> b bands -> band-key groupby. Deterministic across processes: shingle
hashing uses the low 64 bits of md5 (PYTHONHASHSEED-independent AND
replicable in ANSI SQL via DuckDB's ``md5_number_lower`` — what makes
the MinHash-LSH pipeline oracle-checkable end to end), permutations are
a seeded affine family over uint64 (wraparound arithmetic).

Every caption-LSH candidate pair is still verified with the primary
edge predicate hamming(phash) <= radius, so cluster semantics match the
reference exactly; this source only adds robustness (and is the same
machinery exposed for text dedup in idf.functions).
"""

from __future__ import annotations

from hashlib import blake2b, md5

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def md5_low64(s: str) -> int:
    """Low 64 bits of md5 — DuckDB ``md5_number_lower(s)`` exactly
    (the LAST 8 digest bytes, little-endian; verified empirically)."""
    return int.from_bytes(md5(s.encode()).digest()[8:], "little")


def shingle_hashes(text: str, k: int = 3, short: str = "self") -> np.ndarray:
    """Word k-shingles of ``text`` -> sorted unique uint64 hashes.

    ``short`` controls docs with fewer than k tokens: ``"self"`` (default)
    emits one whole-text shingle so every doc has a non-empty set (the
    caption-LSH behavior); ``"drop"`` emits NO shingles — matching the
    SQL trigram oracle, which produces zero shingles for <k-token docs
    (ADVICE r1: the two policies diverge exactly there)."""
    toks = text.lower().split()
    if len(toks) < k:
        if short == "drop":
            return np.array([], dtype=np.uint64)
        shingles = {" ".join(toks)} if toks else {""}
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    out = np.fromiter(
        (md5_low64(s) for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(out)


class MinHasher:
    """Seeded affine MinHash family; build once, apply per batch."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(m,) uint64 shingle hashes -> (num_perm,) uint64 signature."""
        if shingles.size == 0:  # only reachable under short="drop"
            return np.full(self.num_perm, _MASK, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] * shingles[None, :] + self.b[:, None]) & _MASK
        return vals.min(axis=1)

    def signatures(self, texts: list[str], k: int = 3) -> np.ndarray:
        """Batch of captions -> (n, num_perm) uint64."""
        out = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            out[i] = self.signature(shingle_hashes(t, k))
        return out


def band_keys(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n, k) signatures -> (n, n_bands) int64 band keys.

    Key = band index mixed into a blake2b hash of the band's rows, so
    equal keys <=> same band index AND equal band signature (up to the
    64-bit collision floor — collisions only enlarge a verify bucket).
    """
    n, k = sigs.shape
    rows = k // n_bands
    out = np.empty((n, n_bands), dtype=np.int64)
    for i in range(n):
        for b in range(n_bands):
            chunk = sigs[i, b * rows : (b + 1) * rows].tobytes() + bytes([b])
            out[i, b] = int.from_bytes(
                blake2b(chunk, digest_size=8).digest(), "little", signed=True
            )
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
