"""Sketch operators — approximate aggregates whose STATE is exactly
checkable even though the final estimate is approximate.

HyperLogLog distinct-count (Flajolet et al. 2007, public algorithm):
the engine returns the integer REGISTER TABLE (bucket, max_rank), not
the float estimate — registers are a pure max-aggregate of per-row
integer math (md5 bucket + leading-zero rank), so the driver's DuckDB
oracle replicates them bit-for-bit (``md5_number_lower`` + ``bin()``
length), while the float estimate (harmonic mean + bias correction)
stays a pytest-gated helper. That split is the repo's standard
discipline: deterministic integer state through the gate, analytic
properties through pytest.

100-TB shape: the register table IS the combiner — each batch emits at
most 2^p rows (256 at the default p=8) regardless of row count, maxes
merge associatively, and the driver folds blocks x 256 small rows; no
shuffle ever carries raw keys. This is exactly how a multi-node
count-distinct over 10^12 rows should look: constant-size state per
block, one tiny merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from idf.kernels.minhash import md5_low64


def _ranks(keys, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rank) per key; bucket = top p bits of md5_low64(str(k)),
    rank = leading zeros of the remaining 64-p bits + 1 (exact int)."""
    w = 64 - p
    mask = (1 << w) - 1
    buckets = np.empty(len(keys), dtype=np.int64)
    ranks = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        h = md5_low64(str(k))
        buckets[i] = h >> w
        s = h & mask
        ranks[i] = (w + 1) if s == 0 else w - s.bit_length() + 1
    return buckets, ranks


def hll_registers(ds: rd.Dataset, key: str, p: int = 8) -> rd.Dataset:
    """HyperLogLog register table over ``ds[key]`` -> (bucket, max_rank),
    sorted by bucket; buckets never hit are absent (same as the SQL
    groupby). Registers are EXACT (deterministic md5 family)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = pd.unique(df[key])
        if not len(keys):
            return pd.DataFrame(
                {"bucket": pd.Series(dtype=np.int64), "max_rank": pd.Series(dtype=np.int64)}
            )
        b, r = _ranks(keys, p)
        g = pd.DataFrame({"bucket": b, "max_rank": r}).groupby("bucket", sort=False).max()
        return g.reset_index()

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_format="pandas"
        )
    ]
    # driver fold: <= 2^p rows per block by construction
    if not parts:
        return rd.from_pandas(
            pd.DataFrame({"bucket": pd.Series(dtype=np.int64), "max_rank": pd.Series(dtype=np.int64)})
        )
    out = (
        pd.concat(parts, ignore_index=True)
        .groupby("bucket", sort=True)
        .max()
        .reset_index()
        .astype(np.int64)
    )
    return rd.from_pandas(out)


def hll_estimate(registers: pd.DataFrame, p: int = 8) -> float:
    """Standard HLL estimate from a register table (absent buckets count
    as rank 0). Pytest-gated — floats never cross the driver gate."""
    m = 1 << p
    ranks = np.zeros(m, dtype=np.int64)
    ranks[registers["bucket"].to_numpy()] = registers["max_rank"].to_numpy()
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.power(2.0, -ranks))
    zeros = int((ranks == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range (linear counting) correction
    return float(est)
