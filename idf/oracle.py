"""Sequential pure-Python oracle — the reference-equivalent yardstick.

Implements exactly the reference's end-to-end semantics (SURVEY.md §5
conformance strategy) with the same kernels the Ray engine uses, so
engine-vs-oracle comparison is exact:

- hash stage: accepted-format filter + per-row decode + hash, failures
  skipped (app/Commands.java:72-84).
- clustering: connected components of the graph
  {(a, b) : hamming(h_a, h_b) <= radius} — the reference's BFS over
  BK-tree range queries (cluster/Clusterer.java:6-30 with the inclusive
  radius of index/BKTreeIndex.java:43) computes exactly this partition;
  discovery order only affects its UUID draw, not the partition.
- plan: keeper election comparator pixels desc -> size desc -> [mtime:
  not in the schema, documented skip] -> id case-insensitive asc
  (app/Commands.java:212-221), KEEP head / DELETE rest with reason
  strings (Commands.java:223-233); unreadables penalized pixels=-1,
  size=-1 (Commands.java:256-268).

Brute-force O(n^2) pairs — only ever run on small test tables.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from idf.codecs import ACCEPTED_FORMATS, DecodeError, decode
from idf.kernels import hash_image, pairwise_hamming
from idf.kernels.hashes import hash_bytes
from idf.synth import i64_to_u64


@dataclass
class OracleHashes:
    id2hash: dict[str, int]  # unsigned 64-bit
    meta: dict[str, tuple[int, int]]  # id -> (pixels, size_bytes); -1 pixels = unreadable
    skipped: list[str]


def oracle_hash_stage(
    table: pa.Table, algo: str = "phash", exif_from_bytes: bool = False
) -> OracleHashes:
    id2hash: dict[str, int] = {}
    meta: dict[str, tuple[int, int]] = {}
    skipped: list[str] = []
    for row in table.to_pylist():
        if str(row["fmt"]).lower() not in ACCEPTED_FORMATS:
            skipped.append(row["image_id"])
            continue
        data = row["bytes"]
        try:
            h64, ih, iw = hash_bytes(data, algo, exif_from_bytes=exif_from_bytes)
        except DecodeError:
            skipped.append(row["image_id"])
            continue
        id2hash[row["image_id"]] = h64
        meta[row["image_id"]] = (ih * iw, len(data))
    return OracleHashes(id2hash, meta, skipped)


def oracle_components(id2hash: dict[str, int], radius: int) -> list[frozenset[str]]:
    """Connected components over hamming<=radius edges (brute force)."""
    ids = sorted(id2hash)
    if not ids:
        return []
    hashes = np.array([id2hash[i] for i in ids], dtype=np.uint64)
    dist = pairwise_hamming(hashes, hashes)
    adj = dist <= radius
    seen: set[int] = set()
    comps: list[frozenset[str]] = []
    for s in range(len(ids)):
        if s in seen:
            continue
        comp = {s}
        seen.add(s)
        q = deque([s])
        while q:
            cur = q.popleft()
            for nb in np.nonzero(adj[cur])[0]:
                nb = int(nb)
                if nb not in seen:
                    seen.add(nb)
                    comp.add(nb)
                    q.append(nb)
        comps.append(frozenset(ids[i] for i in comp))
    return comps


def clusters_table(comps: list[frozenset[str]]) -> list[tuple[str, str]]:
    """(cluster_id, image_id) rows; deterministic id = min member; drops
    singletons (Commands.java:149-151)."""
    out = []
    for comp in comps:
        if len(comp) < 2:
            continue
        cid = min(comp)
        out.extend((cid, m) for m in sorted(comp))
    return sorted(out)


def keeper_sort_key(image_id: str, pixels: int, size: int):
    """Reference comparator (Commands.java:212-221): pixels desc, size
    desc, then id case-insensitive asc (mtime key absent from schema)."""
    return (-pixels, -size, image_id.lower(), image_id)


def oracle_plan(
    comps: list[frozenset[str]], meta: dict[str, tuple[int, int]]
) -> list[tuple[str, str, str, str]]:
    """(cluster_id, action, image_id, reason) rows for multi-member clusters."""
    rows = []
    for comp in comps:
        if len(comp) < 2:
            continue
        cid = min(comp)
        members = sorted(comp, key=lambda i: keeper_sort_key(i, *meta.get(i, (-1, -1))))
        for rank, m in enumerate(members):
            pixels, size = meta.get(m, (-1, -1))
            action = "KEEP" if rank == 0 else "DELETE"
            tag = "keeper" if rank == 0 else "dupe"
            rows.append((cid, action, m, f"{tag}(pixels={pixels},size={size})"))
    return sorted(rows)


def dup_pairs(comps: list[frozenset[str]]) -> set[tuple[str, str]]:
    """All unordered same-cluster pairs — the recall/precision currency."""
    pairs: set[tuple[str, str]] = set()
    for comp in comps:
        ms = sorted(comp)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def pair_recall_precision(
    got: set[tuple[str, str]], want: set[tuple[str, str]]
) -> tuple[float, float]:
    if not want:
        return 1.0, 1.0 if not got else 0.0
    tp = len(got & want)
    recall = tp / len(want)
    precision = tp / len(got) if got else 1.0
    return recall, precision


def oracle_end_to_end(
    table: pa.Table, radius: int = 10, algo: str = "phash", exif_from_bytes: bool = False
):
    oh = oracle_hash_stage(table, algo, exif_from_bytes=exif_from_bytes)
    comps = oracle_components(oh.id2hash, radius)
    plan = oracle_plan(comps, oh.meta)
    return oh, comps, plan


def verify_phash_column(table: pa.Table, algo: str = "phash") -> int:
    """Check the precomputed ``phash`` column matches recomputation; returns
    number of decodable rows checked (raises on mismatch)."""
    n = 0
    for row in table.to_pylist():
        if str(row["fmt"]).lower() not in ACCEPTED_FORMATS:
            continue
        try:
            got, _, _ = hash_bytes(row["bytes"], algo)
        except DecodeError:
            continue
        expect = i64_to_u64(row["phash"])
        if got != expect:
            raise AssertionError(f"phash mismatch for {row['image_id']}: {got} != {expect}")
        n += 1
    return n
