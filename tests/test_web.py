"""S9/S10 web-surface operators (reference app/WebServer.java)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from idf.stages.web import (
    fetch_images,
    fetch_images_digest,
    media_type_for,
    normalize_action,
    rewrite_plan,
)


def _plan():
    return rd.from_pandas(
        pd.DataFrame(
            {
                "cluster_id": ["c1", "c1", "c2", "c2"],
                "action": ["KEEP", "DELETE", "KEEP", "DELETE"],
                "image_id": ["a", "b", "c", "d"],
                "reason": ["keeper(...)", "dupe(...)", "keeper(...)", "dupe(...)"],
                "pixels": [100, 90, 80, 70],
                "size": [10, 9, 8, 7],
            }
        )
    )


def test_normalize_action_matches_savePlan():
    # WebServer.java:340-344: trim + lowercase; non keep/delete -> keep
    assert normalize_action(" DELETE ") == "DELETE"
    assert normalize_action("delete") == "DELETE"
    assert normalize_action("keep") == "KEEP"
    assert normalize_action("nuke") == "KEEP"
    assert normalize_action(None) == "KEEP"
    assert normalize_action("") == "KEEP"


def test_rewrite_plan_overrides_and_preserves():
    updates = pd.DataFrame(
        {"image_id": ["b", "c", "d"], "action": [" keep ", "Delete", "bogus"]}
    )
    out = rewrite_plan(_plan(), updates).to_pandas().set_index("image_id")
    assert out.loc["a", "action"] == "KEEP"  # untouched
    assert out.loc["b", "action"] == "KEEP"  # flipped to keep
    assert out.loc["c", "action"] == "DELETE"  # flipped to delete
    assert out.loc["d", "action"] == "KEEP"  # bogus -> keep fallback
    assert out.loc["b", "reason"] == "dupe(...)"  # reasons preserved


def test_media_type_dispatch():
    # the exact extension dispatch of WebServer.java:186-206
    assert media_type_for("png") == "image/png"
    assert media_type_for("JPG") == "image/jpeg"
    assert media_type_for("jpeg") == "image/jpeg"
    assert media_type_for("gif") == "image/gif"
    assert media_type_for("bmp") == "image/bmp"
    assert media_type_for("webp") == "image/webp"
    assert media_type_for("txt") == "application/octet-stream"
    assert media_type_for(None) == "application/octet-stream"


def test_fetch_images_roundtrip():
    imgs = rd.from_arrow(
        pa.table(
            {
                "image_id": ["i1", "i2", "i3"],
                "bytes": pa.array([b"aa", b"bbb", b"cccc"], pa.binary()),
                "fmt": ["png", "txt", "jpg"],
            }
        )
    )
    out = fetch_images(imgs, ["i1", "i3"]).to_pandas().set_index("image_id")
    assert sorted(out.index) == ["i1", "i3"]
    assert out.loc["i1", "media_type"] == "image/png"
    assert out.loc["i3", "media_type"] == "image/jpeg"
    assert bytes(out.loc["i1", "bytes"]) == b"aa"
    assert int(out.loc["i3", "n_bytes"]) == 4

    dig = fetch_images_digest(imgs, ["i1"]).to_pandas()
    import hashlib

    assert dig.loc[0, "content_md5"] == hashlib.md5(b"aa".hex().upper().encode()).hexdigest()


def test_fetch_images_empty_idset():
    imgs = rd.from_arrow(
        pa.table({"image_id": ["i1"], "bytes": pa.array([b"x"], pa.binary()), "fmt": ["png"]})
    )
    assert fetch_images(imgs, []).count() == 0


def test_fetch_images_pruned_matches_broadcast(ray_session, small_images_table, tmp_path):
    """Read-side id pushdown returns exactly the broadcast semi-join's
    rows (same ids, same payloads), and the scan-level filter actually
    engages (requesting no ids reads zero rows)."""
    import pandas as pd

    from idf.stages.web import fetch_images_pruned

    src = rd.read_parquet(small_images_table)
    some = [r["image_id"] for r in src.take(30)][::3]
    want = (
        fetch_images(rd.read_parquet(small_images_table), ids=some)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    got = (
        fetch_images_pruned(small_images_table, some)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    want["bytes"] = want["bytes"].map(bytes)
    got["bytes"] = got["bytes"].map(bytes)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["image_id"]) == set(some)
    assert fetch_images_pruned(small_images_table, ["no-such-id"]).count() == 0
