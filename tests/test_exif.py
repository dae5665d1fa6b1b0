"""EXIF orientation kernel (M1) + threshold->radius (M10).

Test semantics ported from the reference's core/ExifTest.java:17-66
(identity for 1 and out-of-range values, per-orientation coordinate
mapping, alpha preservation) and app/Commands.java:406-409 presets.
"""

import numpy as np
import pytest

from idf.config import threshold_to_radius
from idf.kernels.exif import exif_transform, inverse_orientation


@pytest.fixture
def img():
    # tiny asymmetric fixture: distinct value per pixel, H=2 x W=3
    return np.arange(6, dtype=np.uint8).reshape(2, 3)


def test_orientation_1_and_invalid_retain_original(img):
    # testOrientation1RetainsOriginal + testInvalidOrientationRetainsOriginal
    assert exif_transform(img, 1) is img
    assert exif_transform(img, 0) is img
    assert exif_transform(img, 9) is img
    assert exif_transform(img, -3) is img


def test_coordinate_maps(img):
    H, W = img.shape
    cases = {
        2: lambda y, x: img[y, W - 1 - x],          # mirror horizontal
        3: lambda y, x: img[H - 1 - y, W - 1 - x],  # rotate 180
        4: lambda y, x: img[H - 1 - y, x],          # mirror vertical
        5: lambda y, x: img[x, y],                  # transpose
        6: lambda y, x: img[H - 1 - x, y],          # rotate 90 CW
        7: lambda y, x: img[H - 1 - x, W - 1 - y],  # transverse (anti-transpose)
        8: lambda y, x: img[x, W - 1 - y],          # rotate 270 CW
    }
    for o, ref in cases.items():
        out = exif_transform(img, o)
        oh, ow = (W, H) if o in (5, 6, 7, 8) else (H, W)
        assert out.shape == (oh, ow), f"orientation {o}"
        for y in range(oh):
            for x in range(ow):
                assert out[y, x] == ref(y, x), f"orientation {o} at ({y},{x})"
        assert out.flags["C_CONTIGUOUS"]


def test_inverse_roundtrip(img):
    for o in range(1, 9):
        back = exif_transform(exif_transform(img, o), inverse_orientation(o))
        np.testing.assert_array_equal(back, img)


def test_alpha_is_preserved():
    # testAlphaIsPreserved: channel axis (incl. alpha) passes through
    rgba = np.zeros((2, 3, 4), dtype=np.uint8)
    rgba[..., 3] = 128  # 50% alpha everywhere
    rgba[0, 0, :3] = (10, 20, 30)
    for o in range(1, 9):
        out = exif_transform(rgba, o)
        assert out.shape[-1] == 4, f"orientation {o} should preserve alpha"
        assert (out[..., 3] == 128).all()
        if o == 1:
            np.testing.assert_array_equal(out, rgba)


def test_threshold_to_radius_presets():
    # Commands.java:406-409 with the web UI presets
    assert threshold_to_radius(0.95) == 3
    assert threshold_to_radius(1.0) == 0
    assert threshold_to_radius(0.84) == 10
    with pytest.raises(ValueError):
        threshold_to_radius(0.0)
    with pytest.raises(ValueError):
        threshold_to_radius(1.5)


def test_hash_stage_applies_orientation(ray_session):
    """An image stored rotated 90 CW with orientation=8 (undo = rot 270)
    must hash identically to the upright original; without the column it
    must not (the fixture is asymmetric)."""
    import pyarrow as pa
    import ray.data as rd

    from idf.codecs import encode
    from idf.config import DedupConfig
    from idf.stages.hash_stage import hash_stage

    rng = np.random.default_rng(7)
    upright = (rng.uniform(0, 255, (96, 64, 3))).astype(np.uint8)
    rotated = np.ascontiguousarray(np.rot90(upright, k=-1))  # stored 90 CW

    def tbl(rows):
        return pa.table(
            {
                "image_id": pa.array([r[0] for r in rows]),
                "bytes": pa.array([r[1] for r in rows], pa.binary()),
                "fmt": pa.array(["png"] * len(rows)),
                "caption": pa.array([""] * len(rows)),
                "orientation": pa.array([r[2] for r in rows], pa.int32()),
            }
        )

    rows = [
        ("up", encode(upright, "png"), 1),
        ("rot-fixed", encode(rotated, "png"), 8),  # 8 = rotate 270 CW undoes it
        ("rot-raw", encode(rotated, "png"), 1),
    ]
    out = hash_stage(rd.from_arrow(tbl(rows)), DedupConfig()).to_pandas().set_index("image_id")
    assert out.loc["up", "phash"] == out.loc["rot-fixed", "phash"]
    assert out.loc["up", "phash"] != out.loc["rot-raw", "phash"]
