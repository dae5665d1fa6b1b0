"""Apply stage — relational form of the reference's quarantine move.

Reference analog A7 (app/Commands.java:287-354): DELETE rows are moved
into a quarantine directory, keepers stay. Here (SURVEY §2.4 A7):
``dedup_out = images semi-join plan[action != DELETE or not-in-plan]``
and ``quarantine_out = images semi-join plan[DELETE]`` written as two
datasets that partition the input. Filename-uniquing (`safeMove` _N
suffixes) is N/A — image_ids are unique keys.

The DELETE id set is broadcast once via ``ray.put`` (A6's keeper-map
broadcast analog); at 10^12-row scale swap ``broadcast_semi_join`` for
the bucketed ``hash_join`` (same call shape, documented in ops.py).
"""

from __future__ import annotations

import ray.data as rd

from idf.ops import broadcast_semi_join


def collect_delete_ids(plan: rd.Dataset) -> list[str]:
    """Plan is orders of magnitude smaller than images; its id column is
    safe to pull to the driver (reference loads the whole plan CSV,
    Commands.java:292-299)."""
    ids = []
    for batch in plan.iter_batches(batch_size=65536, batch_format="pyarrow"):
        import pyarrow.compute as pc

        sel = batch.filter(pc.equal(batch["action"], "DELETE"))
        ids.extend(sel["image_id"].to_pylist())
    return ids


def apply_stage(images: rd.Dataset, plan: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """-> (kept_images, quarantined_images); the two partition the input."""
    delete_ids = collect_delete_ids(plan)
    kept = broadcast_semi_join(images, "image_id", delete_ids, negate=True)
    quarantined = broadcast_semi_join(images, "image_id", delete_ids, negate=False)
    return kept, quarantined
