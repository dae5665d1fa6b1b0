"""Text deduplication family over the ``documents`` table.

Five dedup modes, as required by the task brief:

- exact: hash-partitioned first-per-text (SQL-checkable)
- n-gram Jaccard: EXACT near-dup pairs via shared-shingle candidate
  generation + distributed intersection counting (SQL-checkable —
  recall is 1.0 because any pair with J >= tau > 0 shares a shingle)
- MinHash-LSH: the probabilistic scale path (banded signatures ->
  bucket groupby -> exact-Jaccard verify); pytest checks it against
  the exact pairs at high tau
- SimHash: 64-bit simhash + the same pigeonhole-banding candidate
  machinery as the image pipeline (code reuse of stages/candidates)
- embedding-cosine near-dup pairs live in idf.functions.ann

Pair outputs are always (doc_id_a < doc_id_b).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from idf.kernels.minhash import MinHasher, band_keys, shingle_hashes
from idf.ops import available_cpus, exact_dedup, hash_join


def exact_dedup_docs(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, text): one representative (min doc_id) per distinct text."""
    return exact_dedup(docs.select_columns(["doc_id", "text"]), key="text", order_col="doc_id")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs


def _shingle_rows(df: pd.DataFrame, k: int) -> pd.DataFrame:
    ids, sh = [], []
    for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
        hs = shingle_hashes(text, k)
        ids.extend([doc_id] * len(hs))
        sh.append(hs)
    return pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "shingle": np.concatenate(sh).view(np.int64) if sh else np.array([], dtype=np.int64),
        }
    )


def ngram_jaccard_pairs(
    docs: rd.Dataset, tau: float = 0.6, k: int = 3, hot_cap: int = 2000
) -> rd.Dataset:
    """EXACT all near-dup pairs with word-k-gram Jaccard >= tau.

    Shape: shingle rows -> groupby(shingle) pair-emit (candidates)
    -> groupby(pair) count = |A∩B| -> join per-doc shingle counts
    -> filter. Shingles shared by more than ``hot_cap`` docs are
    dropped from CANDIDATE GENERATION only (a pair at J >= tau > 0
    shares at least ceil(tau/(1+tau) * (|A|+|B|)) shingles, so for any
    real near-dup pair at tau >= 0.5 the overwhelming majority of its
    shingles are shared; a shingle hot enough to hit the cap is a
    stopword-like n-gram that cannot be a pair's ONLY shared shingle at
    tau >= 0.5 unless the docs are shingle-poor — for safety the cap
    only applies when the bucket exceeds it, and the intersection count
    is computed over ALL shingles of the surviving candidate pairs, so
    precision is always exact).
    """
    from ray.data.aggregate import Count, Sum

    from idf.ops import bucketed_apply

    # two consumers (pair counts + sizes): materialize the small
    # (doc_id:int64, shingle:int64) projection once
    shingles = docs.map_batches(
        lambda df: _shingle_rows(df, k), batch_format="pandas"
    ).materialize()

    def _bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        """One vectorized self-merge per shuffle bucket: emits per-bucket
        partial |A∩B| counts (each shingle lives in exactly one bucket,
        so the global Sum over buckets is the exact intersection)."""
        if len(g):
            hot = g["shingle"].value_counts()
            g = g[g["shingle"].map(hot) <= hot_cap]
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (
            m.groupby(["doc_id_x", "doc_id_y"], sort=False)
            .size()
            .reset_index(name="n_common")
        )
        return out.rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b"}).astype(
            {"id_a": np.int64, "id_b": np.int64, "n_common": np.int64}
        )

    from idf.ops import bucketed_aggregate

    # per-PAIR sum: millions of tiny groups -> bucketed pandas agg, not
    # the per-group native aggregate
    inter = bucketed_aggregate(
        bucketed_apply(shingles, "shingle", _bucket_counts),
        ["id_a", "id_b"],
        {"n_common": ("n_common", "sum")},
    )
    # per-doc shingle-set sizes: one int per document — a classic small
    # side, broadcast once via ray.put instead of a shuffle join (at a
    # scale where even this is too big, swap for the bucketed hash_join;
    # same downstream code)
    import ray

    sizes_df = shingles.groupby("doc_id").aggregate(Count(alias_name="n_shingles")).to_pandas()
    sizes_ref = ray.put(dict(zip(sizes_df["doc_id"], sizes_df["n_shingles"])))

    from idf.ops import get_broadcast

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id_a": pd.Series([], dtype=np.int64),
                    "doc_id_b": pd.Series([], dtype=np.int64),
                    "jaccard": pd.Series([], dtype=np.float64),
                }
            )
        sizes = get_broadcast(sizes_ref)
        n_a = df["id_a"].map(sizes).to_numpy(np.int64)
        n_b = df["id_b"].map(sizes).to_numpy(np.int64)
        # raw IEEE double division of exact ints — bit-identical to
        # the SQL oracle's c*1.0/(na+nb-c), so the value-hash matches
        jac = df["n_common"].to_numpy(np.int64) / (n_a + n_b - df["n_common"].to_numpy(np.int64))
        keep = jac >= tau
        return pd.DataFrame(
            {
                "doc_id_a": df["id_a"].to_numpy(np.int64)[keep],
                "doc_id_b": df["id_b"].to_numpy(np.int64)[keep],
                "jaccard": jac[keep],
            }
        )

    return inter.map_batches(_finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup pairs (probabilistic scale path)


def minhash_lsh_pairs(
    docs: rd.Dataset,
    tau: float = 0.7,
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> rd.Dataset:
    """Candidate pairs from MinHash banding, verified with EXACT Jaccard
    (shingle sets recomputed per pair inside the verify group), so
    precision is exact; recall is the standard LSH s-curve."""

    class Bander:
        def __init__(self):
            self.mh = MinHasher(num_perm, seed)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sigs = self.mh.signatures(list(df["text"].fillna("")), k)
            keys = band_keys(sigs, bands)
            n, b = keys.shape
            return pd.DataFrame(
                {
                    "key": keys.reshape(-1),
                    "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), b),
                    "text": np.repeat(df["text"].fillna("").to_numpy(dtype=object), b),
                }
            )

    banded = docs.select_columns(["doc_id", "text"]).map_batches(
        Bander(), batch_format="pandas"
    )

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {
                    "doc_id_a": pd.Series([], dtype=np.int64),
                    "doc_id_b": pd.Series([], dtype=np.int64),
                    "jaccard": pd.Series([], dtype=np.float64),
                }
            )
        ids = g["doc_id"].to_numpy(np.int64)
        sets = [set(shingle_hashes(t, k).tolist()) for t in g["text"]]
        rows = []
        for i in range(n):
            for j in range(i + 1, n):
                inter = len(sets[i] & sets[j])
                if not inter:
                    continue
                jac = inter / (len(sets[i]) + len(sets[j]) - inter)
                if jac >= tau:
                    rows.append((ids[i], ids[j], round(jac, 6)))
        return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "jaccard"]).astype(
            {"doc_id_a": np.int64, "doc_id_b": np.int64}
        )

    def _verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # singleton band-keys (the vast majority) are filtered
        # vectorized; only real collision groups pay the python verify
        if len(g):
            counts = g["key"].value_counts()
            g = g[g["key"].map(counts) >= 2]
        outs = [_verify(sub) for _, sub in g.groupby("key", sort=False)]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else _verify(g.iloc[0:0])

    from idf.ops import bucketed_apply

    pairs = bucketed_apply(banded, "key", _verify_bucket)
    # J3 dedup (same pair surfaces from several bands)
    from idf.ops import bucketed_aggregate

    return bucketed_aggregate(pairs, ["doc_id_a", "doc_id_b"], {"jaccard": ("jaccard", "max")})


# ---------------------------------------------------------------------------
# SimHash


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over word features (public Charikar construction):
    sign-sum of per-token 64-bit hashes."""
    out = np.empty(len(texts), dtype=np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, text in enumerate(texts):
        toks = text.lower().split()
        if not toks:
            out[i] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for t in set(toks):
            h = int.from_bytes(blake2b(t.encode(), digest_size=8).digest(), "little")
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), toks.count(t), -toks.count(t))
        out[i] = (weights[acc > 0]).sum(dtype=np.uint64)
    return out


def simhash_docs(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, simhash int64 bit-cast)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = simhash64_batch(list(df["text"].fillna("")))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "simhash": h.view(np.int64)})

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pandas")


def simhash_pairs(docs: rd.Dataset, radius: int = 8) -> rd.Dataset:
    """Near-dup pairs at simhash Hamming <= radius, via the SAME
    pigeonhole banding stage as the image pipeline (stages/candidates):
    the hashes table just uses doc ids + simhash in the phash column."""
    from idf.config import DedupConfig
    from idf.stages.candidates import band_edges

    cfg = DedupConfig(radius=radius)
    hashes = simhash_docs(docs).map_batches(
        lambda t: pa.table(
            {
                "id_a": pa.compute.cast(t["doc_id"], pa.string()),
                "phash": t["simhash"],
            }
        ),
        batch_format="pyarrow",
    )
    from idf.stages.candidates import dedup_edges

    edges = dedup_edges(band_edges(hashes, cfg, collapse_identical=False))

    def _orient(t: pa.Table) -> pa.Table:
        # edge ids are strings ordered lexicographically; restore int order
        a = t["id_a"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t["id_b"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id_a": pa.array(np.minimum(a, b)),
                "doc_id_b": pa.array(np.maximum(a, b)),
                "dist": t["dist"],
            }
        )

    return edges.map_batches(_orient, batch_format="pyarrow")
