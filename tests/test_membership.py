"""Bloom-filter membership (idf/functions/membership.py).

Covers: no-false-negatives invariant in both hash families, exact
oracle parity of the md5 family INCLUDING its false positives (small m
forces them), the two-level bitmap OR build, and negate semantics
(definite non-members are exact)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from idf.functions.membership import (
    bloom_member_filter,
    bloom_positions,
    bloom_semi_join_keys,
    build_bloom,
)
from idf.kernels.minhash import md5_low64

RNG = np.random.default_rng(7)


def _ds(keys, col):
    return rd.from_arrow(pa.table({col: pa.array(keys, type=pa.int64())}))


def _reference_members(build_keys, probe_keys, m, k, mode):
    """Driver-side replication of the filter semantics."""
    bits = np.zeros(m, dtype=bool)
    bits[bloom_positions(np.asarray(build_keys), k, m, mode).ravel()] = True
    pos = bloom_positions(np.asarray(probe_keys), k, m, mode)
    return set(np.asarray(probe_keys)[bits[pos].all(axis=1)].tolist())


def test_positions_md5_matches_kernel():
    keys = np.array([0, 1, 12345, 2**40 + 17], dtype=np.int64)
    pos = bloom_positions(keys, k=3, m=4096, mode="md5")
    for j, key in enumerate(keys):
        for i in range(3):
            assert pos[j, i] == md5_low64(f"{i}:{int(key)}") % 4096


@pytest.mark.parametrize("mode", ["md5", "fast"])
def test_no_false_negatives(mode):
    build = RNG.integers(0, 10**9, size=400).tolist()
    probe = build[:100] + RNG.integers(10**9, 2 * 10**9, size=300).tolist()
    m, k = 1 << 12, 4
    got = bloom_semi_join_keys(
        _ds(build, "bk"), "bk", _ds(probe, "pk"), "pk", m=m, k=k, mode=mode
    ).to_pandas()
    members = set(got["pk"].tolist())
    assert set(build[:100]) <= members  # every true member survives
    # sorted, distinct output
    vals = got["pk"].to_numpy()
    assert (np.diff(vals) > 0).all()


@pytest.mark.parametrize("mode", ["md5", "fast"])
def test_false_positive_set_is_deterministic(mode):
    """Tiny m forces false positives; they must equal the driver-side
    replication exactly (what the SQL oracle checks for md5)."""
    build = list(range(1000))
    probe = list(range(900, 1400))
    m, k = 512, 3  # heavily loaded -> many fps
    expect = _reference_members(build, probe, m, k, mode)
    got = bloom_semi_join_keys(
        _ds(build, "bk"), "bk", _ds(probe, "pk"), "pk", m=m, k=k, mode=mode
    ).to_pandas()
    assert set(got["pk"].tolist()) == expect
    assert len(expect - set(range(900, 1000))) > 0  # fps actually occurred


def test_negate_is_exact_antijoin_subset():
    """negate=True keeps DEFINITE non-members: disjoint from the true
    member set (no false negatives means no member ever lands here)."""
    build = list(range(0, 2000, 2))
    probe = list(range(0, 2000))
    bitmap = build_bloom(_ds(build, "k"), "k", m=1 << 12, k=4, mode="fast")
    out = bloom_member_filter(
        _ds(probe, "k"), "k", bitmap, m=1 << 12, k=4, mode="fast", negate=True
    ).to_pandas()
    non_members = set(out["k"].tolist())
    assert non_members.isdisjoint(set(build))
    assert non_members  # filter is discriminating at this load


def test_build_two_level_or_matches_single_pass():
    keys = RNG.integers(0, 10**6, size=5000).tolist()
    m, k = 1 << 13, 4
    # many small blocks to exercise the or_reduce level
    ds = _ds(keys, "k").repartition(37)
    bitmap = build_bloom(ds, "k", m=m, k=k, mode="fast")
    bits = np.zeros(m, dtype=bool)
    bits[bloom_positions(np.asarray(keys), k, m, "fast").ravel()] = True
    assert np.array_equal(np.unpackbits(bitmap)[:m].astype(bool), bits)


def test_m_must_be_byte_aligned():
    with pytest.raises(ValueError):
        build_bloom(_ds([1], "k"), "k", m=100, k=2)
    with pytest.raises(ValueError):
        bloom_positions(np.array([1]), k=2, m=64, mode="nope")
