"""S9/S10 web-surface operators (reference app/WebServer.java)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
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


def test_web_server_end_to_end(ray_session, small_images_table, tmp_path):
    """The full reference endpoint surface (app/WebServer.java:44-287)
    over loopback HTTP: process job -> poll -> clusters/plan -> image
    bytes -> plan update (savePlan normalization) -> apply job."""
    import json
    import threading
    import time
    import urllib.request

    from idf.web_server import serve

    httpd, state = serve(port=0, run_root=str(tmp_path))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def get(path, expect_json=True):
        with urllib.request.urlopen(base + path, timeout=60) as r:
            body = r.read()
            return (json.loads(body) if expect_json else body), r.headers
    def post(path, data=None):
        req = urllib.request.Request(base + path, data=data or b"", method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            body = r.read()
            try:
                return json.loads(body)
            except ValueError:
                return body.decode()

    def wait_job(job_id):
        for _ in range(600):
            j, _h = get(f"/api/job/{job_id}")
            if j["status"] != "running":
                return j
            time.sleep(0.2)
        raise TimeoutError

    try:
        # bad requests mirror the reference's 4xx paths
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/api/process")
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            get("/api/job/nope")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/api/apply")  # no plan yet
        assert ei.value.code == 400

        r = post(f"/api/process?table={small_images_table}&threshold=0.85&algo=phash")
        assert r["status"] == "started"
        job = wait_job(r["jobId"])
        assert job["status"] == "completed", job
        assert job["progress"] == 100

        clusters = get("/api/clusters")[0]
        plan = get("/api/plan")[0]
        assert len(clusters) >= 2 and len(plan) == len(clusters)
        keeps = [p for p in plan if p["action"] == "KEEP"]
        deletes = [p for p in plan if p["action"] == "DELETE"]
        assert keeps and deletes

        # image bytes round-trip with the reference's media types
        some_id = clusters[0]["image_id"]
        body, headers = get(f"/api/image?id={some_id}", expect_json=False)
        assert len(body) > 0
        assert headers["Content-Type"].startswith(("image/", "application/octet-stream"))

        # plan update: flip one DELETE -> keep (lowercase normalizes)
        flip = deletes[0]["image_id"]
        assert post(
            "/api/plan/update",
            json.dumps([{"image_id": flip, "action": "keep"}]).encode(),
        ) == "OK"
        plan2 = {p["image_id"]: p for p in get("/api/plan")[0]}
        assert plan2[flip]["action"] == "KEEP"
        assert plan2[flip]["reason"] == deletes[0]["reason"]  # reason preserved

        # apply the edited plan
        r = post("/api/apply")
        job = wait_job(r["jobId"])
        assert job["status"] == "completed", job
        import ray.data as rdata

        q = rdata.read_parquet(state.run_dir + "/apply_quarantine").to_pandas()
        k = rdata.read_parquet(state.run_dir + "/apply_keep").to_pandas()
        n_src = rdata.read_parquet(small_images_table).count()
        assert len(q) + len(k) == n_src
        assert flip in set(k["image_id"])  # the flipped row stays kept
    finally:
        httpd.shutdown()


def test_web_server_image_on_loose_dir_and_error_path(ray_session, tmp_path):
    """Regression (r4): /api/process accepts a loose-file DIRECTORY, but
    /api/image went straight to the parquet id-pushdown read — every
    image request after a directory job raised inside the handler and
    dropped the connection. Now: directory inputs serve bytes via the
    broadcast semi-join path, and handler exceptions surface as HTTP
    500, never a dropped socket."""
    import json
    import threading
    import time
    import urllib.error
    import urllib.request

    import numpy as np

    from idf.codecs import encode
    from idf.synth import _base_image
    from idf.web_server import serve

    rng = np.random.default_rng(31)
    root = tmp_path / "imgs"
    root.mkdir()
    base = _base_image(rng)
    (root / "a.png").write_bytes(encode(base, "png"))
    (root / "a-q30.jpg").write_bytes(encode(base, "jpg", quality=30))
    (root / "b.png").write_bytes(encode(_base_image(rng), "png"))

    httpd, state = serve(port=0, run_root=str(tmp_path / "web"))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base_url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{base_url}/api/process?directory={root}&threshold=0.85", method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            job_id = json.loads(r.read())["jobId"]
        for _ in range(600):
            with urllib.request.urlopen(f"{base_url}/api/job/{job_id}", timeout=60) as r:
                j = json.loads(r.read())
            if j["status"] != "running":
                break
            time.sleep(0.2)
        assert j["status"] == "completed", j

        with urllib.request.urlopen(f"{base_url}/api/image?id=a.png", timeout=60) as r:
            body = r.read()
            assert body == (root / "a.png").read_bytes()
            assert r.headers["Content-Type"] == "image/png"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base_url}/api/image?id=missing.png", timeout=60)
        assert ei.value.code == 404

        # handler exceptions -> HTTP 500, not a dropped connection
        state.table_path = str(tmp_path / "bogus.parquet")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base_url}/api/image?id=a.png", timeout=60)
        assert ei.value.code == 500
    finally:
        httpd.shutdown()


def test_ui_workflow_loopback(ray_session, small_images_table, tmp_path):
    """The reference's WebUITest journey (app/WebUITest.java:87-623)
    reproduced without Selenium: GET / serves the SPA wired to the same
    endpoints, then the exact request sequence the page's script issues
    — process -> poll -> PAGED clusters/plan loads -> auto-select edit
    (largest kept per group, WebUITest.java:521-575) -> save -> apply —
    is driven over loopback HTTP and asserted server-side."""
    import collections
    import json
    import threading
    import time
    import urllib.request

    from idf.web_server import serve

    httpd, state = serve(port=0, run_root=str(tmp_path))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=60) as r:
            return r.read(), r.headers

    def get_json(path):
        return json.loads(get(path)[0])

    def post(path, data=None):
        req = urllib.request.Request(base + path, data=data or b"", method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            body = r.read()
            try:
                return json.loads(body)
            except ValueError:
                return body.decode()

    def wait_job(job_id):
        for _ in range(600):
            j = get_json(f"/api/job/{job_id}")
            if j["status"] != "running":
                return j
            time.sleep(0.2)
        raise TimeoutError

    def fetch_all(path, page):
        # the SPA's paged loader: ask until a short page arrives
        rows, off = [], 0
        while True:
            batch = get_json(f"{path}?limit={page}&offset={off}")
            rows.extend(batch)
            if len(batch) < page:
                return rows
            off += page

    try:
        # 1. uiLoadsSuccessfully: GET / is the SPA, wired to the API
        html, headers = get("/")
        assert headers["Content-Type"].startswith("text/html")
        page = html.decode()
        for needle in (
            "/api/process", "/api/job/", "/api/clusters", "/api/plan",
            "/api/plan/update", "/api/apply", "/api/image",
        ):
            assert needle in page, f"UI not wired to {needle}"
        # setupPanelDisplaysCorrectly: similar-mode defaults + presets
        assert 'value="0.95"' in page and "phash" in page
        assert '"1.0"' in page and "ahash" in page  # identical preset

        # 2. processImagesStartsJob -> poll to completion
        r = post(f"/api/process?table={small_images_table}&threshold=0.95&algo=phash")
        job = wait_job(r["jobId"])
        assert job["status"] == "completed", job

        # 3. loadData, paged: pages are disjoint slices of the stage
        clusters = fetch_all("/api/clusters", page=4)
        plan = fetch_all("/api/plan", page=4)
        full_plan = get_json("/api/plan")
        assert {p["image_id"] for p in plan} == {p["image_id"] for p in full_plan}
        assert len(plan) == len(full_plan) > 4, "pagination did not page"
        assert get_json(f"/api/plan?limit=4&offset={len(full_plan) + 10}") == []

        # 4. autoSelectButtonWorks semantics, computed like the UI does:
        # keep the largest `size` per group, delete the rest
        by_group = collections.defaultdict(list)
        sizes = {p["image_id"]: p["size"] for p in plan}
        for c in clusters:
            by_group[c["cluster_id"]].append(c["image_id"])
        updates = []
        for ids in by_group.values():
            best = max(ids, key=lambda i: (sizes.get(i, -1), i))
            updates.extend(
                {"image_id": i, "action": "keep" if i == best else "delete"} for i in ids
            )
        assert post("/api/plan/update", json.dumps(updates).encode()) == "OK"
        plan2 = {p["image_id"]: p for p in get_json("/api/plan")}
        n_keep = sum(1 for p in plan2.values() if p["action"] == "KEEP")
        assert n_keep == len(by_group), "auto-select must keep exactly one per group"

        # 5. applyPlan -> quarantine holds exactly the DELETE rows
        job = wait_job(post("/api/apply")["jobId"])
        assert job["status"] == "completed", job
        import ray.data as rdata

        q = rdata.read_parquet(state.run_dir + "/apply_quarantine").to_pandas()
        want_deleted = {i for i, p in plan2.items() if p["action"] == "DELETE"}
        assert set(q["image_id"]) == want_deleted
    finally:
        httpd.shutdown()
