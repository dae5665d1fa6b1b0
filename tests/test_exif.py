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


def test_exif_orientation_parse_real():
    """Real APP1/TIFF orientation parse (beyond the reference's stubbed
    readOrientationSafe, core/Exif.java:57-59): every value written by
    the in-repo encoder reads back; absent/malformed -> safe 1."""
    from idf.codecs.jfif import _exif_app1, encode_jfif, exif_orientation

    img = np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3)
    assert exif_orientation(encode_jfif(img, quality=90)) == 1  # no APP1
    for o in range(1, 9):
        assert exif_orientation(encode_jfif(img, quality=90, orientation=o)) == o
    # big-endian TIFF variant
    app1_le = _exif_app1(6)
    data = encode_jfif(img, quality=90)
    mm = app1_le.replace(b"II*\x00\x08\x00\x00\x00", b"MM\x00*\x00\x00\x00\x08")
    mm = mm.replace(
        b"\x01\x00\x12\x01\x03\x00\x01\x00\x00\x00\x06\x00\x00\x00",
        b"\x00\x01\x01\x12\x00\x03\x00\x00\x00\x01\x00\x06\x00\x00",
    )
    assert exif_orientation(data[:2] + mm + data[2:]) == 6
    # malformed / absent / non-jpeg
    assert exif_orientation(b"\xff\xd8\xff\xe1\x00\x08Exif\x00\x00") == 1
    assert exif_orientation(b"not a jpeg") == 1
    assert exif_orientation(data[:2] + b"\xff\xe1\x00\x10Exif\x00\x00XXtrash" + data[2:]) == 1


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/fixtures/exif-tests"),
    reason="reference fixtures absent",
)
def test_exif_orientation_reference_fixture():
    """ExifTest.java:19 parity: no-orientation.jpg reads as 1."""
    from idf.codecs.jfif import exif_orientation

    data = open("/root/reference/fixtures/exif-tests/no-orientation.jpg", "rb").read()
    assert exif_orientation(data) == 1


def test_exif_bytes_fallback_matches_column(ray_session):
    """With DedupConfig(exif_from_bytes=True), a real JPEG whose EXIF
    says orientation=6, hashed WITHOUT an orientation column, equals
    the same pixels hashed WITH column=6 — the stage's bytes-level
    fallback and the column path are one semantic (and hash_bytes, the
    oracle/synth path, agrees). DEFAULT config ignores bytes-EXIF for
    reference parity (the shipped reference stubs orientation to 1)."""
    import pyarrow as pa
    import ray.data as rd

    from idf.codecs.jfif import encode_jfif
    from idf.config import DedupConfig
    from idf.kernels.hashes import hash_bytes
    from idf.stages.hash_stage import hash_stage

    rng = np.random.default_rng(8)
    yy, xx = np.mgrid[0:80, 0:64]
    img = np.clip(
        np.stack([xx * 3, yy * 2, xx + yy], axis=-1) % 256 + rng.normal(0, 2, (80, 64, 3)),
        0,
        255,
    ).astype(np.uint8)
    plain = encode_jfif(img, quality=92)
    tagged = encode_jfif(img, quality=92, orientation=6)

    def tbl(rows, with_col):
        cols = {
            "image_id": pa.array([r[0] for r in rows]),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
            "fmt": pa.array(["jpg"] * len(rows)),
            "caption": pa.array([""] * len(rows)),
        }
        if with_col:
            cols["orientation"] = pa.array([r[2] for r in rows], pa.int32())
        return pa.table(cols)

    cfg_on = DedupConfig(exif_from_bytes=True)
    got_fallback = (
        hash_stage(rd.from_arrow(tbl([("x", tagged, None)], False)), cfg_on)
        .to_pandas()
        .set_index("image_id")
    )
    got_column = (
        hash_stage(rd.from_arrow(tbl([("x", plain, 6)], True)), cfg_on)
        .to_pandas()
        .set_index("image_id")
    )
    assert got_fallback.loc["x", "phash"] == got_column.loc["x", "phash"]
    # DEFAULT config: bytes-EXIF is IGNORED (reference parity) — the
    # tagged row hashes like the untransformed pixels
    got_default = (
        hash_stage(rd.from_arrow(tbl([("x", tagged, None)], False)), DedupConfig())
        .to_pandas()
        .set_index("image_id")
    )
    got_plain_default = (
        hash_stage(rd.from_arrow(tbl([("x", plain, None)], False)), DedupConfig())
        .to_pandas()
        .set_index("image_id")
    )
    assert got_default.loc["x", "phash"] == got_plain_default.loc["x", "phash"]
    assert got_default.loc["x", "phash"] != got_column.loc["x", "phash"]
    # column (when present) wins over bytes: EXIF=6 with column=1 == plain
    got_override = (
        hash_stage(rd.from_arrow(tbl([("x", tagged, 1)], True)), DedupConfig())
        .to_pandas()
        .set_index("image_id")
    )
    got_plain = (
        hash_stage(rd.from_arrow(tbl([("x", plain, 1)], True)), DedupConfig())
        .to_pandas()
        .set_index("image_id")
    )
    assert got_override.loc["x", "phash"] == got_plain.loc["x", "phash"]
    # oracle path (hash_bytes) agrees with the stage under BOTH flags
    assert (
        hash_bytes(tagged, exif_from_bytes=True)[0]
        == np.uint64(got_fallback.loc["x", "phash"]).item()
    )
    assert hash_bytes(tagged)[0] == np.uint64(got_default.loc["x", "phash"]).item()
