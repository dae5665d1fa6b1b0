"""Connected components over the verified candidate-edge list.

Reference analog X4 (cluster/Clusterer.java:6-30): BFS flood fill over
``hamming <= radius`` neighborhoods == connected components of the edge
graph; discovery order only affects the reference's UUID draw, never the
partition (SURVEY §2.6). Cluster ids here are deterministic: the min
member ``image_id``.

Two implementations (SURVEY §7 step 5):

- driver union-find: streams edge batches to the driver
  (``iter_batches``, never ``take_all`` of wide rows) and unions in
  O(alpha) per edge. Memory is O(#nodes that appear in edges) — the
  near-dup minority, not the corpus. Default below
  ``cfg.cc_driver_max_edges``.
- label propagation: fully distributed min-label fixpoint
  (groupby-min per round) for edge lists too big for one machine;
  rounds = graph diameter (near-dup components are tiny, so 2-4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

CLUSTER_SCHEMA = pa.schema([("cluster_id", pa.string()), ("image_id", pa.string())])


class _UnionFind:
    __slots__ = ("parent", "size")

    def __init__(self):
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]


def components_driver(edges: rd.Dataset) -> pa.Table:
    """Vectorized driver-side connected components -> (cluster_id, image_id).

    Streams edge batches to the driver, factorizes node ids to ints,
    then runs min-label propagation with pointer jumping — every step a
    whole-array numpy op, O(E * diameter) with tiny diameters for
    near-dup graphs. Handles tens of millions of edges in seconds;
    beyond driver memory, ``components_labelprop`` is the distributed
    path (cfg.cc_mode)."""
    import pandas as pd

    parts_a, parts_b = [], []
    for batch in edges.iter_batches(batch_size=262144, batch_format="pyarrow"):
        parts_a.append(batch["id_a"].to_pandas())
        parts_b.append(batch["id_b"].to_pandas())
    if not parts_a:
        return pa.table(
            {"cluster_id": pa.array([], pa.string()), "image_id": pa.array([], pa.string())}
        )
    a = pd.concat(parts_a, ignore_index=True)
    b = pd.concat(parts_b, ignore_index=True)
    codes, uniques = pd.factorize(pd.concat([a, b], ignore_index=True), sort=False)
    n = len(uniques)
    ea = codes[: len(a)]
    eb = codes[len(a) :]

    labels = np.arange(n, dtype=np.int64)
    while True:
        edge_min = np.minimum(labels[ea], labels[eb])
        new = labels.copy()
        np.minimum.at(new, ea, edge_min)
        np.minimum.at(new, eb, edge_min)
        while True:  # pointer jumping to the current root
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, labels):
            break
        labels = new

    # deterministic cluster id = lexicographic min image_id per component
    ids = np.asarray(uniques, dtype=object)
    df = pd.DataFrame({"root": labels, "image_id": ids})
    min_id = df.groupby("root", sort=False)["image_id"].transform("min")
    df = df.assign(cluster_id=min_id).sort_values("image_id", kind="mergesort")
    return pa.table(
        {
            "cluster_id": pa.array(df["cluster_id"].to_numpy(), pa.string()),
            "image_id": pa.array(df["image_id"].to_numpy(), pa.string()),
        }
    )


def components_labelprop(edges: rd.Dataset, max_iters: int = 50) -> rd.Dataset:
    """Distributed min-label propagation to fixpoint.

    labels(node) starts at node; each round every edge sends both
    endpoints' labels both ways and each node takes the min
    (groupby(node).min(label)); converged when no label changed.
    Deterministic output: label == min member id.
    """
    from ray.data.aggregate import Min

    sym = edges.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays([t["id_a"].combine_chunks(), t["id_b"].combine_chunks()]),
                "dst": pa.concat_arrays([t["id_b"].combine_chunks(), t["id_a"].combine_chunks()]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # small (id pairs only); reused every round

    labels = (
        sym.groupby("src")
        .aggregate(Min("dst", alias_name="min_nb"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["src"],
                    "label": pa.compute.min_element_wise(t["src"], t["min_nb"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(max_iters):
        # join labels onto edge sources, propagate to dst, take min
        from idf.ops import hash_join

        msgs = hash_join(
            sym, labels.map_batches(lambda t: t.rename_columns(["src", "label"]), batch_format="pyarrow"),
            on="src",
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}), batch_format="pyarrow"
        )
        self_msgs = labels
        new_labels = (
            msgs.union(self_msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # convergence: count rows whose label changed
        both = hash_join(
            new_labels,
            labels.map_batches(
                lambda t: t.rename_columns(["node", "old_label"]), batch_format="pyarrow"
            ),
            on="node",
        )
        changed = both.map_batches(
            lambda t: pa.table(
                {"c": pa.compute.cast(pa.compute.not_equal(t["label"], t["old_label"]), pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        if not changed:
            break
    return labels.map_batches(
        lambda t: pa.table({"cluster_id": t["label"], "image_id": t["node"]}),
        batch_format="pyarrow",
    )


def connected_components(edges: rd.Dataset, cfg=None) -> rd.Dataset:
    """Dispatch per cfg.cc_mode ('driver' | 'labelprop' | 'auto')."""
    mode = getattr(cfg, "cc_mode", "auto") if cfg is not None else "auto"
    if mode == "labelprop":
        return components_labelprop(edges)
    if mode == "auto":
        limit = getattr(cfg, "cc_driver_max_edges", 5_000_000) if cfg is not None else 5_000_000
        if edges.count() > limit:
            return components_labelprop(edges)
    return rd.from_arrow(components_driver(edges))
