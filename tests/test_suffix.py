"""Suffix-array substring dedup: kernel exactness + distributed parity.

The sequential suffix-array+LCP oracle (idf/kernels/suffix.py) is
itself validated against a brute-force Counter oracle; the distributed
rolling-hash operator is then validated against the SA oracle on the
real documents table. (No reference counterpart — the reference is
image-only; semantics follow Lee et al. 2021 corpus substring dedup.)
"""

import random
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from idf.functions.text_dedup import substring_dup_positions, substring_dup_spans
from idf.kernels.suffix import (
    batch_window_hashes,
    dup_window_positions_sa,
    lcp_kasai,
    merge_window_spans,
    rolling_window_hashes,
    suffix_array,
    text_codes,
)

SF = "/root/testdata/sf0.001"


def _naive_dups(texts, L):
    c = Counter()
    for t in texts:
        for i in range(len(t) - L + 1):
            c[t[i : i + L]] += 1
    return sorted(
        (d, i)
        for d, t in enumerate(texts)
        for i in range(len(t) - L + 1)
        if c[t[i : i + L]] >= 2
    )


def test_suffix_array_and_lcp_vs_naive():
    rng = random.Random(11)
    for _ in range(25):
        s = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 150)))
        codes = text_codes(s)
        sa = suffix_array(codes)
        naive = sorted(range(len(s)), key=lambda i: s[i:])
        assert list(sa) == naive
        lcp = lcp_kasai(codes, sa)
        for r in range(1, len(s)):
            a, b = s[naive[r - 1] :], s[naive[r] :]
            k = 0
            while k < min(len(a), len(b)) and a[k] == b[k]:
                k += 1
            assert lcp[r] == k


def test_dup_positions_sa_and_rolling_hash_vs_naive():
    rng = random.Random(23)
    for _ in range(40):
        texts = [
            "".join(rng.choice("abcd") for _ in range(rng.randrange(0, 60)))
            for _ in range(rng.randrange(1, 8))
        ]
        if rng.random() < 0.7 and len(texts) >= 2:
            frag = "".join(rng.choice("abcd") for _ in range(12))
            texts[0] += frag
            texts[-1] = frag + texts[-1]
        for L in (3, 6, 9):
            exp = _naive_dups(texts, L)
            assert dup_window_positions_sa(texts, L) == exp
            di, pos, h = batch_window_hashes(texts, L)
            hc = Counter(h.tolist())
            mask = np.array([hc[x] >= 2 for x in h.tolist()], dtype=bool)
            got = sorted(zip(di[mask].tolist(), pos[mask].tolist()))
            assert got == exp


def test_rolling_hash_position_independent():
    # identical windows at different offsets/documents hash identically
    h1 = rolling_window_hashes(text_codes("xxhello world"), 5)
    h2 = rolling_window_hashes(text_codes("hello there"), 5)
    assert h1[2] == h2[0]  # both "hello"
    # and multibyte chars are character-exact
    assert len(rolling_window_hashes(text_codes("héllo"), 5)) == 1


def test_merge_window_spans():
    assert merge_window_spans(np.array([0, 1, 5, 20]), 4) == [(0, 9), (20, 24)]
    assert merge_window_spans(np.array([3]), 10) == [(3, 13)]
    assert merge_window_spans(np.array([0, 4]), 4) == [(0, 8)]  # touching merge
    assert merge_window_spans(np.array([0, 5]), 4) == [(0, 4), (5, 9)]
    assert merge_window_spans(np.array([], dtype=np.int64), 4) == []


@pytest.fixture(scope="module")
def docs_table():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_substring_dup_positions_vs_sa_oracle(ray_session, docs_table):
    t = docs_table
    got = (
        substring_dup_positions(rd.from_arrow(t), min_len=30)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
    )
    texts = [x or "" for x in t["text"].to_pylist()]
    ids = t["doc_id"].to_pylist()
    exp = sorted((ids[d], p) for d, p in dup_window_positions_sa(texts, 30))
    assert list(zip(got["doc_id"], got["pos"])) == exp
    assert len(exp) > 0  # testdata really exercises the operator


def test_substring_dup_spans_vs_sa_oracle(ray_session, docs_table):
    t = docs_table
    got = (
        substring_dup_spans(rd.from_arrow(t), min_len=30)
        .to_pandas()
        .sort_values(["doc_id", "start"])
    )
    texts = [x or "" for x in t["text"].to_pylist()]
    ids = t["doc_id"].to_pylist()
    by_doc: dict[int, list[int]] = {}
    for d, p in dup_window_positions_sa(texts, 30):
        by_doc.setdefault(ids[d], []).append(p)
    exp = sorted(
        (doc, s, e)
        for doc, ps in by_doc.items()
        for s, e in merge_window_spans(np.array(ps), 30)
    )
    assert list(zip(got["doc_id"], got["start"], got["stop"])) == exp


def test_substring_verify_routes_identical(ray_session, docs_table):
    """The r4 broadcast+rehash verify (default: candidate hash set
    broadcast once, windows RECOMPUTED with text attached, one thin
    win-keyed exchange) equals the r3 co-group attach fallback
    (broadcast_max_cands=0) row for row, and the route gate observably
    engages both ways."""
    from idf.functions.text_dedup import SUBSTRING_STATS

    def run(**kw):
        # read-rooted plan: the fused gate's metadata byte estimate is
        # known pre-execution (as in the production harness)
        src = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        return (
            substring_dup_positions(src, min_len=30, **kw)
            .to_pandas()
            .sort_values(["doc_id", "pos"])
            .reset_index(drop=True)
        )

    fused = run(fused_max_bytes=1 << 40)
    assert SUBSTRING_STATS["verify_route"] == "fused_winkey"
    assert len(fused) > 0

    bcast = run(fused_max_bytes=0)
    assert SUBSTRING_STATS["verify_route"] == "broadcast_rehash"
    assert SUBSTRING_STATS["win_verify"] == "driver"
    assert SUBSTRING_STATS["n_candidates"] >= len(bcast)
    pd.testing.assert_frame_equal(fused, bcast)

    slow = run(fused_max_bytes=0, broadcast_max_cands=0)
    assert SUBSTRING_STATS["verify_route"] == "cogroup_attach"
    pd.testing.assert_frame_equal(fused, slow)

    # force the distributed win-verify inside the broadcast route
    import idf.functions.text_dedup as td

    old = td._DRIVER_VERIFY_MAX
    td._DRIVER_VERIFY_MAX = 0
    try:
        dist = run(fused_max_bytes=0)
        assert SUBSTRING_STATS["win_verify"] == "exchange"
    finally:
        td._DRIVER_VERIFY_MAX = old
    pd.testing.assert_frame_equal(fused, dist)


def test_substring_spans_bucketed_large_path(ray_session, docs_table):
    """driver_merge_max_positions=0 forces the distributed doc_id-shuffle
    merge; results must be identical to the driver fast path."""
    t = docs_table
    fast = (
        substring_dup_spans(rd.from_arrow(t), min_len=30)
        .to_pandas()
        .sort_values(["doc_id", "start"])
        .reset_index(drop=True)
    )
    dist = (
        substring_dup_spans(rd.from_arrow(t), min_len=30, driver_merge_max_positions=0)
        .to_pandas()
        .sort_values(["doc_id", "start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist)
