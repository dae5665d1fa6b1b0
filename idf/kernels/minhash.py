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
        """Batch of captions -> (n, num_perm) uint64.

        Vectorized across the batch: shingle-hash arrays are
        concatenated once, then each permutation is one affine pass +
        segmented min (``np.minimum.reduceat`` over doc boundaries) —
        the r1 per-doc loop built a (num_perm, m) matrix per DOCUMENT,
        ~237k tiny numpy calls per sf0.1 batch sweep. short="self"
        guarantees every doc has >= 1 shingle, so no reduceat segment
        is empty."""
        n = len(texts)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        arrs = [shingle_hashes(t, k) for t in texts]
        counts = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
        h = np.concatenate(arrs)
        bounds = np.concatenate([[0], np.cumsum(counts)[:-1]])
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                vals = self.a[p] * h + self.b[p]
                out[:, p] = np.minimum.reduceat(vals, bounds)
        return out


def _mix64_(x: np.ndarray, tmp: np.ndarray) -> None:
    """splitmix64 finalizer IN PLACE (uint64 wraparound); ``tmp`` is a
    same-shaped scratch buffer — fresh numpy temporaries page-fault
    stall on this platform (see stages/cc.py r2 note), so the mix
    chain reuses two buffers total."""
    np.right_shift(x, np.uint64(30), out=tmp)
    x ^= tmp
    x *= np.uint64(0xBF58476D1CE4E5B9)
    np.right_shift(x, np.uint64(27), out=tmp)
    x ^= tmp
    x *= np.uint64(0x94D049BB133111EB)
    np.right_shift(x, np.uint64(31), out=tmp)
    x ^= tmp


def band_keys(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n, k) signatures -> (n, n_bands) int64 band keys.

    Key = band index chained with the band's signature rows through a
    splitmix64 mix, so equal keys <=> same band index AND equal band
    signature (up to the 64-bit collision floor — collisions only
    enlarge a verify bucket, never lose a pair). Fully vectorized over
    (n, n_bands): the r1 version ran one blake2b per (row, band) —
    7.6M interpreter-bound digest calls per sf0.1 caption sweep."""
    n, k = sigs.shape
    rows = k // n_bands
    bands = sigs[:, : n_bands * rows].reshape(n, n_bands, rows)
    with np.errstate(over="ignore"):
        seed = np.arange(1, n_bands + 1, dtype=np.uint64)
        _mix64_(seed, np.empty_like(seed))
        h = np.tile(seed, (n, 1))
        tmp = np.empty_like(h)
        buf = np.empty_like(h)
        for r in range(rows):
            np.copyto(buf, bands[:, :, r])
            _mix64_(buf, tmp)
            h ^= buf
            _mix64_(h, tmp)
    return h.view(np.int64)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
