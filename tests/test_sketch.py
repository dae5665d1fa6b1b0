"""HyperLogLog sketch (idf/functions/sketch.py): exact register table
vs a driver-side replication, merge invariance across partitionings,
and estimate accuracy on a known cardinality."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from idf.functions.sketch import _ranks, hll_estimate, hll_registers
from idf.kernels.minhash import md5_low64


def _reference(keys, p):
    b, r = _ranks(list(keys), p)
    return (
        pd.DataFrame({"bucket": b, "max_rank": r})
        .groupby("bucket", sort=True)
        .max()
        .reset_index()
        .astype(np.int64)
    )


def test_rank_math_exact():
    # hand-checked: rank = leading zeros of the low 56 bits + 1
    for k in (0, 1, 77, 123456789):
        h = md5_low64(str(k))
        b, r = _ranks([k], 8)
        assert b[0] == h >> 56
        s = h & ((1 << 56) - 1)
        want = 57 if s == 0 else 56 - s.bit_length() + 1
        assert r[0] == want


@pytest.mark.parametrize("nblocks", [1, 13])
def test_registers_match_reference_any_partitioning(ray_session, nblocks):
    keys = np.concatenate([np.arange(3000), np.arange(500)])  # dups too
    ds = rd.from_arrow(pa.table({"user_id": keys})).repartition(nblocks)
    got = hll_registers(ds, "user_id", p=8).to_pandas()
    want = _reference(np.unique(keys), 8)
    assert got.equals(want)


def test_estimate_accuracy(ray_session):
    n = 10_000
    ds = rd.from_arrow(pa.table({"k": np.arange(n, dtype=np.int64)}))
    regs = hll_registers(ds, "k", p=8).to_pandas()
    est = hll_estimate(regs, p=8)
    assert abs(est / n - 1.0) < 0.2  # p=8 stderr ~6.5%; 3 sigma

    # small range takes the linear-counting branch and stays accurate
    small = rd.from_arrow(pa.table({"k": np.arange(40, dtype=np.int64)}))
    est_s = hll_estimate(hll_registers(small, "k", p=8).to_pandas(), p=8)
    assert abs(est_s / 40 - 1.0) < 0.2


def test_p_validation(ray_session):
    ds = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError):
        hll_registers(ds, "k", p=2)
