"""Suffix-array substring duplicate detection kernels.

North-rule component: "MinHash/SimHash/suffix-array substring" dedup.
This module holds the SEQUENTIAL exact machinery — a numpy
prefix-doubling suffix array + Kasai LCP — used as the pytest oracle
and the small-input reference path, plus the vectorized rolling-hash
window kernel that the distributed operator
(idf/functions/text_dedup.py: substring_dup_positions) runs per batch.

Semantics (corpus substring dedup a la Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better"): a character position
``p`` of document ``d`` is DUPLICATED iff the length-``L`` window
``d.text[p:p+L]`` occurs at least twice in the whole corpus (within or
across documents). Maximal duplicated regions are the union of the
duplicated windows (``merge_window_spans``). The reference repo has no
substring dedup (images only); semantics here come from the published
corpus-dedup literature, config defaults are ours.

Positions are 0-indexed CHARACTER offsets (matching DuckDB
``substr(text, p+1, L)``); all kernels operate on UTF-32 codepoints so
multi-byte text stays character-exact.
"""

from __future__ import annotations

import numpy as np

# odd 64-bit multiplier (FNV-1a prime); odd => invertible mod 2**64,
# which is what lets the O(n) cumsum rolling hash renormalize windows
_B = 0x100000001B3
_B_INV = pow(_B, -1, 1 << 64)


def text_codes(text: str) -> np.ndarray:
    """Character codepoints as uint64 (vectorized via UTF-32)."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


# ---------------------------------------------------------------------------
# suffix array + LCP (exact sequential oracle)


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (numpy lexsort, O(n log^2 n)).

    Fine for the oracle/small-input role (hundreds of KB); the
    distributed path never builds a global suffix array.
    """
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def lcp_kasai(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """lcp[r] = LCP(suffix sa[r-1], suffix sa[r]); lcp[0] = 0. Kasai's
    O(n) algorithm (the h counter decreases at most n times total)."""
    n = len(sa)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def dup_window_positions_sa(texts: list[str], L: int) -> list[tuple[int, int]]:
    """EXACT duplicated-window positions via suffix array + LCP.

    Returns sorted (doc_index, pos) for every position whose L-window
    occurs >= 2 times in the corpus. Exactness: suffixes sharing a
    prefix >= L form a contiguous run in SA order, so a window is
    duplicated iff lcp[r] >= L or lcp[r+1] >= L for its suffix's rank
    r. Documents are concatenated with a '\\x00' separator; a window
    containing the separator can never be reported because its
    within-document position bound excludes it, and its SA neighbors at
    lcp >= L would need a separator at the same offset (i.e. both
    cross a boundary) so it can't act as a false witness either.
    """
    if L < 1:
        raise ValueError("L must be >= 1")
    if not texts:
        return []
    sep = np.array([0], dtype=np.uint64)  # '\x00' separator codepoint
    parts: list[np.ndarray] = []
    for t in texts:
        parts.append(text_codes(t or ""))
        parts.append(sep)
    codes = np.concatenate(parts[:-1]) if parts else np.empty(0, np.uint64)
    n = len(codes)
    if n < L:
        return []
    sa = suffix_array(codes)
    lcp = lcp_kasai(codes, sa)
    m = n - L + 1  # suffixes long enough to hold a window
    sa_m = sa[:]
    dup_at_rank = np.zeros(n, dtype=bool)
    dup_at_rank[1:] = lcp[1:] >= L
    dup_at_rank[:-1] |= lcp[1:] >= L
    dup_global = np.zeros(n, dtype=bool)
    dup_global[sa_m[dup_at_rank]] = True
    dup_global[n - L + 1 :] = False  # window would run off the end

    lens = np.array([len(t or "") for t in texts], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])  # +1 for separator
    out: list[tuple[int, int]] = []
    for d, (s, ln) in enumerate(zip(starts, lens)):
        w = ln - L + 1
        if w <= 0:
            continue
        hits = np.nonzero(dup_global[s : s + w])[0]
        out.extend((d, int(p)) for p in hits)
    return out


# ---------------------------------------------------------------------------
# vectorized rolling hash (the distributed per-batch kernel)


def rolling_window_hashes(codes: np.ndarray, L: int) -> np.ndarray:
    """uint64 hash of every length-L window of ``codes``, vectorized.

    h[i] = sum_j codes[i+j] * B**j (mod 2**64), computed in O(n) via a
    weighted cumsum: W[i] = C[i+L-1] - C[i-1] = sum codes[j]*B**j over
    the window (position-weighted), then renormalized by B**-i (B odd
    => invertible mod 2**64). uint64 wraparound IS the modulus.
    """
    n = len(codes)
    m = n - L + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pw = np.empty(n, dtype=np.uint64)
        pw[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _B, dtype=np.uint64), out=pw[1:])
        inv = np.empty(m, dtype=np.uint64)
        inv[0] = 1
        if m > 1:
            np.cumprod(np.full(m - 1, _B_INV, dtype=np.uint64), out=inv[1:])
        c = np.cumsum(codes.astype(np.uint64) * pw, dtype=np.uint64)
        w = c[L - 1 :].copy()
        w[1:] -= c[: m - 1]
        return w * inv


def batch_window_hashes(
    texts: list[str], L: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rolling L-window hashes for a BATCH of texts in one numpy pass.

    Concatenates the batch (no separator needed: windows that would
    cross a document boundary are simply never selected), hashes once,
    then gathers each document's valid window range. Returns
    (doc_index_per_window, pos_per_window, hash_per_window) — all 1-D,
    aligned, with pos 0-indexed within the document.
    """
    if L < 1:
        raise ValueError("L must be >= 1")
    if not texts:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=np.uint64)
    codes = (
        np.frombuffer("".join(t or "" for t in texts).encode("utf-32-le"), dtype=np.uint32)
        .astype(np.uint64)
    )
    h = rolling_window_hashes(codes, L)
    lens = np.array([len(t or "") for t in texts], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens[:-1])])
    m = np.maximum(lens - L + 1, 0)
    tot = int(m.sum())
    if tot == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=np.uint64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), m)
    pos = np.arange(tot, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(m)[:-1]]), m
    )
    gidx = pos + np.repeat(starts, m)
    return doc_idx, pos, h[gidx]


def batch_window_keys(
    texts: list[str], L: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """``batch_window_hashes`` + the raw window BYTES per window, all in
    one vectorized pass. Returns (doc_index, pos, hash, win) aligned;
    ``win`` is a numpy ``S{4L}`` array of the window's exact UTF-32-LE
    bytes — a strided gather, no per-window Python slicing.

    The byte keys make the distributed verify EXACT with zero extra
    passes: equal strings <=> equal byte keys. Trailing-NUL stripping in
    numpy/python bytes comparisons is safe here because all keys share
    the fixed length 4L: two fixed-length buffers that compare equal
    after trailing-zero stripping are byte-identical.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    if L < 1:
        raise ValueError("L must be >= 1")
    z = np.empty(0, dtype=np.int64)
    wdt = f"S{4 * L}"
    if not texts:
        return z, z, np.empty(0, np.uint64), np.empty(0, wdt)
    raw = "".join(t or "" for t in texts).encode("utf-32-le")
    codes = np.frombuffer(raw, dtype=np.uint32).astype(np.uint64)
    h = rolling_window_hashes(codes, L)
    lens = np.array([len(t or "") for t in texts], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens[:-1])])
    m = np.maximum(lens - L + 1, 0)
    tot = int(m.sum())
    if tot == 0:
        return z, z, np.empty(0, np.uint64), np.empty(0, wdt)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), m)
    pos = np.arange(tot, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(m)[:-1]]), m
    )
    gidx = pos + np.repeat(starts, m)
    b = np.frombuffer(raw, dtype=np.uint8)
    sw = sliding_window_view(b, 4 * L)[::4]  # one row per character position
    wins = np.ascontiguousarray(sw[gidx]).view(wdt).ravel()
    return doc_idx, pos, h[gidx], wins


def merge_window_spans(positions: np.ndarray, L: int) -> list[tuple[int, int]]:
    """Union of windows [p, p+L) for sorted-or-not positions of ONE doc:
    maximal duplicated character spans [start, stop)."""
    if len(positions) == 0:
        return []
    ps = np.sort(np.asarray(positions, dtype=np.int64))
    breaks = np.nonzero(np.diff(ps) > L)[0]
    starts = ps[np.concatenate([[0], breaks + 1])]
    ends = ps[np.concatenate([breaks, [len(ps) - 1]])] + L
    return list(zip(starts.tolist(), ends.tolist()))
