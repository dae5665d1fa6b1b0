"""Incremental dedup (run_dedup base_hashes_dir=...): hashing only a
delta table and unioning a prior run's committed hashes stage must
reproduce the full-recompute clusters and plan byte-for-byte."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from idf.config import DedupConfig
from idf.kernels.minhash import md5_low64
from idf.pipelines.dedup import read_stage, run_dedup


def _split(images_path: str, out_dir) -> tuple[str, str]:
    t = pq.read_table(images_path)
    mask = pa.array([md5_low64(s) % 4 == 0 for s in t["image_id"].to_pylist()])
    base_p = str(out_dir / "base.parquet")
    delta_p = str(out_dir / "delta.parquet")
    pq.write_table(t.filter(pa.compute.invert(mask)), base_p)
    pq.write_table(t.filter(mask), delta_p)
    return base_p, delta_p


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_incremental_equals_full(ray_session, small_images_table, tmp_path_factory):
    work = tmp_path_factory.mktemp("incr")
    base_p, delta_p = _split(small_images_table, work)

    full_run = str(work / "full_run")
    base_run = str(work / "base_run")
    incr_run = str(work / "incr_run")
    run_dedup(small_images_table, full_run, DedupConfig(), resume=False, do_apply=False)
    run_dedup(base_p, base_run, DedupConfig(), resume=False, do_apply=False)
    man = run_dedup(
        delta_p,
        incr_run,
        DedupConfig(),
        resume=False,
        do_apply=False,
        base_hashes_dir=f"{base_run}/hashes",
    )

    for stage in ("clusters", "plan"):
        got = _sorted(read_stage(incr_run, stage).to_pandas())
        want = _sorted(read_stage(full_run, stage).to_pandas())
        assert got.equals(want), stage

    # the union hashes stage covers base + delta exactly once
    n_full = read_stage(full_run, "hashes").count()
    n_incr = read_stage(incr_run, "hashes").count()
    assert n_full == n_incr
    assert man.is_committed("hashes")


def test_incremental_rejects_mode_mismatch(
    ray_session, small_images_table, tmp_path_factory
):
    """A base run hashed in a different mode (different stage schema)
    must fail loudly, not union mismatched columns."""
    work = tmp_path_factory.mktemp("incr_mismatch")
    base_p, delta_p = _split(small_images_table, work)
    base_run = str(work / "base_run")
    # base in full-decode mode: no 'verify' column in the stage schema
    run_dedup(
        base_p,
        base_run,
        DedupConfig(use_precomputed_phash=False),
        resume=False,
        do_apply=False,
    )
    with pytest.raises(RuntimeError, match="hash-schema mismatch"):
        run_dedup(
            delta_p,
            str(work / "incr_run"),
            DedupConfig(use_precomputed_phash=True),
            resume=False,
            do_apply=False,
            base_hashes_dir=f"{base_run}/hashes",
        )
