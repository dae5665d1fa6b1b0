"""Apply stage — relational form of the reference's quarantine move.

Reference analog A7 (app/Commands.java:287-354): DELETE rows are moved
into a quarantine directory, keepers stay. Here (SURVEY §2.4 A7):
``dedup_out = images semi-join plan[action != DELETE or not-in-plan]``
and ``quarantine_out = images semi-join plan[DELETE]`` written as two
datasets that partition the input. Filename-uniquing (`safeMove` _N
suffixes) is N/A — image_ids are unique keys.

Size-adaptive (like ``cc_mode="auto"``): when the DELETE set is small
it is broadcast once via ``ray.put`` (A6's keeper-map broadcast analog)
and the images stream unshuffled; past ``broadcast_max_ids`` the plan
ids stay distributed and each output is produced by one co-grouping
``set_membership_join`` shuffle (at 10^12 rows deletes are ~half the
corpus — no driver list can hold them).
"""

from __future__ import annotations

import ray.data as rd

from idf.ops import broadcast_semi_join, set_membership_join

BROADCAST_MAX_IDS = 5_000_000


def delete_ids_ds(plan: rd.Dataset) -> rd.Dataset:
    import pyarrow as pa
    import pyarrow.compute as pc

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["action"], "DELETE")).select(["image_id"])

    return plan.map_batches(_f, batch_format="pyarrow")


def collect_delete_ids(plan: rd.Dataset) -> list[str]:
    """Driver-side id list for the broadcast path (reference loads the
    whole plan CSV, Commands.java:292-299)."""
    ids = []
    for batch in delete_ids_ds(plan).iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids.extend(batch["image_id"].to_pylist())
    return ids


def apply_stage(
    images: rd.Dataset, plan: rd.Dataset, broadcast_max_ids: int = BROADCAST_MAX_IDS
) -> tuple[rd.Dataset, rd.Dataset]:
    """-> (kept_images, quarantined_images); the two partition the input."""
    deletes = delete_ids_ds(plan)
    if deletes.count() <= broadcast_max_ids:
        delete_ids = collect_delete_ids(plan)
        kept = broadcast_semi_join(images, "image_id", delete_ids, negate=True)
        quarantined = broadcast_semi_join(images, "image_id", delete_ids, negate=False)
    else:
        kept = set_membership_join(images, "image_id", deletes, negate=True)
        quarantined = set_membership_join(images, "image_id", deletes, negate=False)
    return kept, quarantined
