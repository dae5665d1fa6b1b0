"""Fixed single-core box-speed probe — no Ray, no corpus.

The sandbox hypervisor goes through multi-minute (sometimes multi-hour)
slow windows: CPU steal / reduced per-core clocks that inflate every
absolute wall measured during the window by 25-45% while leaving
interleaved RATIOS (the scaling-efficiency protocol) intact. This probe
gives a 10-second, input-independent way to date a measurement: run it
next to any bench and compare against the recorded samples in
``BENCH/box_speed_r5.json``.

Two deliberately different workloads, both single-threaded:

- ``matmul6_s``: six 2048x2048 float64 matmuls (OpenBLAS pinned to one
  thread) — memory-bandwidth + FPU bound, tracks the slowdown the image
  hash stage sees.
- ``pyloop3M_s``: a 3M-iteration pure-Python integer loop — interpreter
  dispatch bound, tracks what the pure-Python JFIF entropy decoder sees.

Prints one JSON line. Usage: ``python scripts/box_speed_probe.py``.
"""

import json
import os
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402  (env vars must precede the import)


def probe() -> dict:
    a = np.random.RandomState(0).rand(2048, 2048)
    t0 = time.perf_counter()
    for _ in range(6):
        a @ a
    t1 = time.perf_counter()
    s = 0
    t2 = time.perf_counter()
    for i in range(3_000_000):
        s += i & 0xFF
    t3 = time.perf_counter()
    assert s == 382_493_856  # fixed workload, fixed answer
    return {
        "metric": "box_speed_probe",
        "matmul6_s": round(t1 - t0, 3),
        "pyloop3M_s": round(t3 - t2, 3),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
