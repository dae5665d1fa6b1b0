"""Microbench: shingle/token hash families (r2 verdict #3).

Measures the per-process kernel throughput of shingle_hash_concat over
the sf0.1 documents corpus in both families and records the ratio in
BENCH/text_hash_modes.json. No Ray — this is the hot inner kernel every
text op spends its map_batches time in.

Run: python scripts/bench_text_hash.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from idf.kernels.minhash import shingle_hash_concat
from idf.functions.text_dedup import simhash64_batch


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    texts = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])[
        "text"
    ].to_pylist()
    texts = ["" if t is None else t for t in texts]
    n_chars = sum(len(t) for t in texts)
    out = {"sf_dir": sf, "n_docs": len(texts), "n_chars": n_chars, "kernels": {}}

    from idf.kernels.minhash import MinHasher

    mh = MinHasher(128, 42)
    for name, fn in {
        "shingle_md5": lambda: shingle_hash_concat(texts, 3, mode="md5"),
        "shingle_fast": lambda: shingle_hash_concat(texts, 3, mode="fast"),
        "shingle_fast_nodedup": lambda: shingle_hash_concat(
            texts, 3, mode="fast", unique=False
        ),
        "signatures_md5": lambda: mh.signatures(texts, 3, mode="md5"),
        "signatures_fast": lambda: mh.signatures(texts, 3, mode="fast"),
        "simhash_md5": lambda: simhash64_batch(texts, mode="md5"),
        "simhash_fast": lambda: simhash64_batch(texts, mode="fast"),
    }.items():
        sec = best_of(fn)
        out["kernels"][name] = {
            "sec": round(sec, 4),
            "mchars_per_sec": round(n_chars / sec / 1e6, 2),
        }

    k = out["kernels"]
    out["speedup_shingle_fast_over_md5"] = round(
        k["shingle_md5"]["sec"] / k["shingle_fast"]["sec"], 2
    )
    out["speedup_signatures_fast_over_md5"] = round(
        k["signatures_md5"]["sec"] / k["signatures_fast"]["sec"], 2
    )
    out["speedup_simhash_fast_over_md5"] = round(
        k["simhash_md5"]["sec"] / k["simhash_fast"]["sec"], 2
    )
    # open-vocabulary corpus: the synthetic sf tables have a ~30-word
    # vocabulary, which lets the md5 branch memoize almost every call;
    # real corpora have open vocabularies where md5 pays one Python
    # digest per distinct token. Deterministic random-hex tokens model
    # that regime.
    import numpy as np

    rng = np.random.default_rng(7)
    vocab_texts = [
        " ".join(f"{v:010x}" for v in rng.integers(0, 1 << 40, 60)) for _ in range(5000)
    ]
    ov_chars = sum(len(t) for t in vocab_texts)
    out["open_vocab"] = {"n_docs": len(vocab_texts), "n_chars": ov_chars, "kernels": {}}
    for name, fn in {
        "shingle_md5": lambda: shingle_hash_concat(vocab_texts, 3, mode="md5"),
        "shingle_fast": lambda: shingle_hash_concat(vocab_texts, 3, mode="fast"),
        "signatures_md5": lambda: mh.signatures(vocab_texts, 3, mode="md5"),
        "signatures_fast": lambda: mh.signatures(vocab_texts, 3, mode="fast"),
        "simhash_md5": lambda: simhash64_batch(vocab_texts, mode="md5"),
        "simhash_fast": lambda: simhash64_batch(vocab_texts, mode="fast"),
    }.items():
        sec = best_of(fn)
        out["open_vocab"]["kernels"][name] = {
            "sec": round(sec, 4),
            "mchars_per_sec": round(ov_chars / sec / 1e6, 2),
        }
    kv = out["open_vocab"]["kernels"]
    for op in ("shingle", "signatures", "simhash"):
        out["open_vocab"][f"speedup_{op}_fast_over_md5"] = round(
            kv[f"{op}_md5"]["sec"] / kv[f"{op}_fast"]["sec"], 2
        )

    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "text_hash_modes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
