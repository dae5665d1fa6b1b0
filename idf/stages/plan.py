"""Keeper-election plan stage.

Reference analog A3/A4 (app/Commands.java:186-243): per cluster, sort
members by pixels desc -> size desc -> (mtime: absent from the schema,
documented adaptation per SURVEY §2.4 A3) -> id case-insensitive asc;
head = KEEP, rest = DELETE, with ``keeper(...)`` / ``dupe(...)`` reason
strings (Commands.java:223-233). Metadata comes from the hash-stage
output columns (pixels, size) instead of a per-file probe — decode
failures carry the reference's unreadable penalty pixels=-1, size=-1
(Commands.java:256-268).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from idf.ops import hash_join

PLAN_SCHEMA = pa.schema(
    [
        ("cluster_id", pa.string()),
        ("action", pa.string()),
        ("image_id", pa.string()),
        ("reason", pa.string()),
        ("pixels", pa.int64()),
        ("size", pa.int64()),
    ]
)


def elect_keeper_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.assign(__lower=g["image_id"].str.lower()).sort_values(
        ["pixels", "size", "__lower", "image_id"],
        ascending=[False, False, True, True],
        kind="mergesort",
    )
    n = len(g)
    actions = ["KEEP"] + ["DELETE"] * (n - 1)
    reasons = [
        f"{'keeper' if i == 0 else 'dupe'}(pixels={p},size={s})"
        for i, (p, s) in enumerate(zip(g["pixels"], g["size"]))
    ]
    return pd.DataFrame(
        {
            "cluster_id": g["cluster_id"].to_numpy(),
            "action": actions,
            "image_id": g["image_id"].to_numpy(),
            "reason": reasons,
            "pixels": g["pixels"].to_numpy(),
            "size": g["size"].to_numpy(),
        }
    )


def plan_stage(clusters: rd.Dataset, meta: rd.Dataset) -> rd.Dataset:
    """clusters (cluster_id, image_id) x meta (image_id, pixels, size)
    -> plan rows. The join is the distributed hash join; the per-cluster
    sort is local (groups are near-dup families — tiny)."""
    from idf.ops import bucketed_group_apply

    joined = hash_join(clusters, meta.select_columns(["image_id", "pixels", "size"]), on="image_id")
    return bucketed_group_apply(joined, "cluster_id", elect_keeper_group)
