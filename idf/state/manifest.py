"""Run manifest: per-stage commit, per-partition lineage + metrics, resume.

Formalizes the reference's implicit checkpoint model — stages
communicate only via files, so every stage boundary is a resume point
(SURVEY §3.4: hash -> hashes.csv -> cluster -> clusters.csv -> plan ->
plan.csv). Here each stage writes a partitioned Parquet directory
atomically (write to ``<name>.tmp``, rename on success), and the
manifest records per-partition lineage (file, rows, bytes) plus stage
metrics. A rerun with ``resume=True`` skips committed stages — that is
the north rule's "resumes mid-pipeline after failure" requirement, with
partition-level skip on the write side (finished stage directories are
never recomputed).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from typing import Callable

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

MANIFEST_NAME = "manifest.json"


class RunManifest:
    def __init__(self, run_dir: str, resume: bool = True):
        self.run_dir = run_dir
        self.resume = resume
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, MANIFEST_NAME)
        self._lock = threading.Lock()  # independent stages may commit concurrently
        self.state: dict = {"stages": {}}
        if resume and os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)

    # -- persistence -------------------------------------------------------

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.run_dir, name)

    def is_committed(self, name: str) -> bool:
        info = self.state["stages"].get(name)
        return bool(info and info.get("status") == "committed" and os.path.isdir(self.stage_dir(name)))

    # -- stage execution ---------------------------------------------------

    def run_stage(
        self,
        name: str,
        build: Callable[[], rd.Dataset],
        metrics: dict | None = None,
        coalesce: int | None = None,
    ) -> str:
        """Execute ``build`` -> write parquet atomically -> commit; or skip
        if already committed and resume is on. Returns the stage output
        directory (read it back with ``ray.data.read_parquet``).

        ``coalesce``: cap output partitions (small row-only outputs from
        a 512-bucket shuffle otherwise fragment into hundreds of tiny
        files that tax every downstream read)."""
        out = self.stage_dir(name)
        if self.resume and self.is_committed(name):
            return out
        t0 = time.time()
        tmp = out + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        # NOTE: the old output is removed only AFTER the new one is
        # fully written to tmp — a lazy build may legitimately READ the
        # stage it replaces (web plan edit), and a crash mid-build must
        # leave the committed output intact for resume
        ds = build()
        if isinstance(ds, (pa.Table, pd.DataFrame)):
            # driver fast paths (CC, plan election) return a local table;
            # writing it with pyarrow directly skips a whole Ray
            # from_arrow -> write job (~1.5s of fixed overhead per stage)
            os.makedirs(tmp, exist_ok=True)
            table = pa.Table.from_pandas(ds, preserve_index=False) if isinstance(ds, pd.DataFrame) else ds
            pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
        else:
            if coalesce is not None:
                ds = ds.repartition(coalesce)
            ds.write_parquet(tmp)
            # a ZERO-row dataset writes no files and no directory at all
            # (Ray's parquet sink: "0 rows and 0.0B written"), so the
            # atomic rename below would crash — an empty stage (e.g. a
            # fully-unique corpus yields zero candidate edges) must
            # commit as an empty directory, not fail the pipeline
            os.makedirs(tmp, exist_ok=True)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.replace(tmp, out)
        parts = self._partition_lineage(out)
        with self._lock:
            self.state["stages"][name] = {
                "status": "committed",
                "output": out,
                "wall_sec": round(time.time() - t0, 3),
                "rows": sum(p["rows"] for p in parts),
                "partitions": parts,
                "metrics": metrics or {},
            }
            self._save()
        return out

    def replace_stage(self, name: str, build: Callable[[], rd.Dataset], **kw) -> str:
        """Recommit a stage with NEW contents (the web plan-edit flow,
        S9: savePlan overwrites the plan file): drop the committed entry
        so resume cannot skip, then run ``build`` atomically."""
        with self._lock:
            self.state["stages"].pop(name, None)
            self._save()
        return self.run_stage(name, build, **kw)

    def run_stages_concurrent(self, stages: list[tuple[str, Callable[[], rd.Dataset]]]) -> list[str]:
        """Run INDEPENDENT stages concurrently (each in a thread; Ray
        jobs interleave and share the cluster) — overlaps their shuffle
        barriers and fills cores a single stage would leave idle."""
        import concurrent.futures as cf

        if len(stages) == 1:
            name, build = stages[0]
            return [self.run_stage(name, build)]
        with cf.ThreadPoolExecutor(max_workers=len(stages)) as ex:
            futs = [ex.submit(self.run_stage, name, build) for name, build in stages]
            return [f.result() for f in futs]

    def record_metrics(self, name: str, extra: dict) -> None:
        with self._lock:
            info = self.state["stages"].setdefault(name, {"status": "metrics-only"})
            info.setdefault("metrics", {}).update(extra)
            self._save()

    @staticmethod
    def _partition_lineage(out_dir: str) -> list[dict]:
        import pyarrow.parquet as pq

        parts = []
        for fn in sorted(os.listdir(out_dir)):
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(out_dir, fn)
            md = pq.ParquetFile(p).metadata
            parts.append({"file": fn, "rows": md.num_rows, "bytes": os.path.getsize(p)})
        return parts

    def summary(self) -> dict:
        return {
            name: {k: v for k, v in info.items() if k != "partitions"}
            for name, info in self.state["stages"].items()
        }
