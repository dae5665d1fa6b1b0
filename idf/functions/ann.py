"""Similarity search over the ``embeddings`` table (list<float> column).

- ``cosine_topk``: brute-force exact cosine top-k per query — numpy
  matmul per batch against a broadcast (``ray.put``) query matrix; the
  baseline required by the task brief, SQL-checkable via DuckDB
  ``list_cosine_similarity``.
- ``cosine_pairs``: exact near-dup pairs (cosine >= tau) — blocked
  matmul against the broadcast normalized matrix.
- ``ivf_topk``: the scale path — seeded-sample IVF centroids, coarse
  assign via matmul, probe the ``nprobe`` nearest centroids only.
  Probabilistic recall; pytest measures it against the brute-force
  baseline.

At 10^12-row scale the broadcast side stays the (small) query set /
centroid table while the big side streams — these stages already have
that shape (matrix shipped once per actor via ``ray.put``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from idf.ops import available_cpus


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _topk_rows(sims: np.ndarray, qids, vids: np.ndarray, k: int, exclude_self: bool):
    """sims (nq, n) -> long rows (vec_id, neighbor_id, sim, rank)."""
    rows = []
    for qi in range(sims.shape[0]):
        s = sims[qi]
        order = np.lexsort((vids, -s))  # sim desc, id asc — deterministic
        cnt = 0
        for idx in order:
            if exclude_self and vids[idx] == qids[qi]:
                continue
            rows.append((qids[qi], int(vids[idx]), round(float(s[idx]), 6), cnt + 1))
            cnt += 1
            if cnt >= k:
                break
    return rows


def cosine_topk(
    embeddings: rd.Dataset, query_ids: list[int], k: int = 5, exclude_self: bool = True
) -> rd.Dataset:
    """Exact top-k cosine neighbors for each query vector.

    Two passes over the (streamed) table: pass 1 collects only the
    query vectors (tiny); pass 2 scores every batch against the
    broadcast query matrix and emits per-batch partial top-k, reduced
    by a final groupby — no full materialization of the big side.
    """
    qset = set(int(q) for q in query_ids)
    qrows = embeddings.map_batches(
        lambda df: df[df["vec_id"].isin(qset)][["vec_id", "embedding"]],
        batch_format="pandas",
    ).to_pandas()
    qrows = qrows.sort_values("vec_id")
    qids = qrows["vec_id"].to_numpy(np.int64)
    qmat_ref = ray.put(_normalize(_stack(qrows["embedding"])))

    from idf.ops import get_broadcast

    def scorer(df: pd.DataFrame) -> pd.DataFrame:
        q = get_broadcast(qmat_ref)
        m = _normalize(_stack(df["embedding"]))
        vids = df["vec_id"].to_numpy(np.int64)
        sims = q @ m.T  # (nq, batch)
        rows = _topk_rows(sims, qids, vids, k, exclude_self)
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "sim", "rank"]).astype(
            {"vec_id": np.int64, "neighbor_id": np.int64, "rank": np.int64}
        )

    partial = embeddings.map_batches(scorer, batch_format="pandas", batch_size=4096)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    return partial.groupby("vec_id").map_groups(_reduce, batch_format="pandas")


def cosine_pairs(embeddings: rd.Dataset, tau: float = 0.9) -> rd.Dataset:
    """Exact (vec_id_a < vec_id_b, sim >= tau) near-duplicate pairs.

    The comparison side is broadcast once (embeddings are the small
    dimension-64 table here); each streamed batch does one matmul
    against it. The documented scale path replaces the broadcast with
    IVF-bucketed pair generation (same verify)."""
    all_rows = embeddings.select_columns(["vec_id", "embedding"]).to_pandas().sort_values("vec_id")
    vids_all = all_rows["vec_id"].to_numpy(np.int64)
    mat_ref = ray.put(_normalize(_stack(all_rows["embedding"])))

    from idf.ops import get_broadcast

    def pair_scorer(df: pd.DataFrame) -> pd.DataFrame:
        mat = get_broadcast(mat_ref)
        b = _normalize(_stack(df["embedding"]))
        bids = df["vec_id"].to_numpy(np.int64)
        sims = b @ mat.T  # (batch, n)
        ii, jj = np.nonzero(sims >= tau)
        keep = bids[ii] < vids_all[jj]
        ii, jj = ii[keep], jj[keep]
        return pd.DataFrame(
            {
                "vec_id_a": bids[ii],
                "vec_id_b": vids_all[jj],
                "sim": np.round(sims[ii, jj], 6),
            }
        ).astype({"vec_id_a": np.int64, "vec_id_b": np.int64})

    return embeddings.map_batches(pair_scorer, batch_format="pandas", batch_size=4096)


def ivf_topk(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> rd.Dataset:
    """IVF approximate top-k: centroids from a seeded sample, each row
    assigned to its nearest centroid (coarse quantizer), queries probe
    only the ``nprobe`` nearest cells."""
    sample = embeddings.random_sample(
        min(1.0, (n_centroids * 8) / max(embeddings.count(), 1)), seed=seed
    ).to_pandas()
    cents = _normalize(_stack(sample["embedding"]))[:n_centroids]
    if len(cents) < n_centroids:
        n_centroids = len(cents)
    cents_ref = ray.put(cents)

    qset = set(int(q) for q in query_ids)
    qrows = (
        embeddings.map_batches(
            lambda df: df[df["vec_id"].isin(qset)][["vec_id", "embedding"]],
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    qmat = _normalize(_stack(qrows["embedding"]))
    qids = qrows["vec_id"].to_numpy(np.int64)
    probe_cells = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_ref = ray.put((qids, qmat, probe_cells))

    from idf.ops import get_broadcast

    def cell_scorer(df: pd.DataFrame) -> pd.DataFrame:
        cents_l, (qids_l, qmat_l, cells_l) = get_broadcast(cents_ref), get_broadcast(probe_ref)
        m = _normalize(_stack(df["embedding"]))
        vids = df["vec_id"].to_numpy(np.int64)
        assign = np.argmax(m @ cents_l.T, axis=1)  # coarse cell per row
        rows = []
        for qi in range(len(qids_l)):
            mask = np.isin(assign, cells_l[qi])
            if not mask.any():
                continue
            sims = qmat_l[qi] @ m[mask].T
            sub = vids[mask]
            rows.extend(_topk_rows(sims[None, :], qids_l[qi : qi + 1], sub, k, True))
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "sim", "rank"]).astype(
            {"vec_id": np.int64, "neighbor_id": np.int64, "rank": np.int64}
        )

    partial = embeddings.map_batches(cell_scorer, batch_format="pandas", batch_size=4096)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))

    return partial.groupby("vec_id").map_groups(_reduce, batch_format="pandas")
