"""Parquet-backed stand-ins for the public Lance API surface the engine
touches — the `lance` wheel is absent in this container (pip install is
unavailable; the vendoring attempt is recorded in BENCH/BASELINE.md), so
the Lance code paths are exercised through these fakes in contract
tests (tests/test_precomputed_phash.py, tests/test_pipeline_e2e.py).

The fakes implement EXACTLY the attributes the engine calls, nothing
more, so they double as documentation of the dependency surface:

  lance.dataset(path)            -> LanceDataset
  LanceDataset.schema            -> pyarrow schema (.names)
  LanceDataset.count_rows()      -> int
  LanceDataset.get_fragments()   -> list[LanceFragment]
  LanceDataset.get_fragment(id)  -> LanceFragment (random access)
  LanceFragment.fragment_id      -> int
  LanceFragment.to_table(columns=...) -> pa.Table (projected read of
                                         that fragment's data files)

This module lives inside ``idf`` (not tests/) deliberately: Ray worker
processes can import it by reference, so verify passes that fan
fragments out as tasks run for real under the fake — a tests/-local
stub would fail to unpickle in the workers.
"""

from __future__ import annotations

import types

import pyarrow as pa
import pyarrow.parquet as pq


class FakeLanceFragment:
    def __init__(self, table: pa.Table, fragment_id: int):
        self._t = table
        self.fragment_id = int(fragment_id)

    def to_table(self, columns=None) -> pa.Table:
        return self._t.select(columns) if columns is not None else self._t


class FakeLanceDataset:
    def __init__(self, parquet_path: str, rows_per_fragment: int = 64):
        t = pq.read_table(parquet_path)
        self.schema = t.schema
        self._frags = [
            FakeLanceFragment(t.slice(lo, rows_per_fragment), fid)
            for fid, lo in enumerate(range(0, max(len(t), 1), rows_per_fragment))
        ]
        self._n = len(t)

    def count_rows(self) -> int:
        return self._n

    def get_fragments(self):
        return list(self._frags)

    def get_fragment(self, fragment_id: int) -> FakeLanceFragment:
        return self._frags[int(fragment_id)]


def fake_lance_module(parquet_path: str, rows_per_fragment: int = 64) -> types.ModuleType:
    """A module object usable as ``sys.modules['lance']`` whose
    ``dataset()`` ignores the path and opens ``parquet_path``."""
    mod = types.ModuleType("lance")
    mod.dataset = lambda path: FakeLanceDataset(parquet_path, rows_per_fragment)
    return mod
