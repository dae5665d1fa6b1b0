"""Native (compiled) vs pure-Python baseline entropy decode: the two
paths must be bit-identical — outputs AND error behavior — because the
native kernel (idf/codecs/native.py) is a transliteration of the
Python loop in jfif._decode_baseline_scan, not a reimplementation with
its own semantics. The Python path stays the conformance reference and
the no-compiler fallback.

All other JFIF tests (analytic hashes, PSNR ladder, fixture
conformance) exercise whichever path the box supports, so this file is
the only place that needs to force both."""

import numpy as np
import pytest

import idf.codecs.jfif as jfif
from idf.codecs import native
from idf.codecs.jfif import JfifError, decode_jfif, decode_jfif_luma_scaled, encode_jfif

pytestmark = pytest.mark.skipif(
    native.get_lib() is None,
    reason="no C toolchain on this box: decoder runs the pure-Python path everywhere",
)


def _both(fn, data):
    """(result|None, err|None) for native and forced-Python paths."""
    out = []
    for force_py in (False, True):
        orig = jfif._native_baseline_scan
        if force_py:
            jfif._native_baseline_scan = lambda *a: False
        try:
            out.append((fn(data), None))
        except JfifError as e:
            out.append((None, str(e)))
        finally:
            jfif._native_baseline_scan = orig
    return out


def _assert_identical(fn, data):
    (a, ea), (b, eb) = _both(fn, data)
    assert ea == eb
    if a is None:
        assert b is None
    else:
        if isinstance(a, tuple):
            a, b = a[0], b[0]
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("gray", [False, True])
@pytest.mark.parametrize("sub", ["420", "444"])
@pytest.mark.parametrize("ri", [0, 3])
def test_grid_conformance(gray, sub, ri):
    rng = np.random.default_rng(hash((gray, sub, ri)) % 2**32)
    for size in [(8, 8), (17, 23), (64, 48), (129, 200)]:
        for q in (30, 88):
            shape = size if gray else (*size, 3)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            data = encode_jfif(img, quality=q, subsampling=sub, restart_interval=ri)
            _assert_identical(decode_jfif, data)
            _assert_identical(lambda d: decode_jfif_luma_scaled(d, 16), data)
            _assert_identical(lambda d: decode_jfif_luma_scaled(d, 32), data)


def test_truncation_and_corruption_error_parity():
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    data = encode_jfif(img, quality=85, restart_interval=4)
    for cut in (len(data) // 3, len(data) // 2, len(data) - 10):
        _assert_identical(decode_jfif, data[:cut])
    for flip in range(24):
        pos = len(data) // 2 + flip * 11
        if pos >= len(data):
            break
        d = bytearray(data)
        d[pos] ^= 0x5A
        _assert_identical(decode_jfif, bytes(d))


def test_fuzz_outcome_parity():
    """Adversarial bytes: random garbage after SOI, heavy mutations of a
    real stream, truncation+mutation. Both paths must agree on outcome —
    same pixels or the same JfifError message — and the C kernel must
    never crash or corrupt memory where numpy indexing would raise (the
    bounds-guard returns map onto the same error strings)."""
    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    base = encode_jfif(img, quality=70, restart_interval=2)

    def run(d):
        # catch broadly: a malformed header can raise KeyError/struct
        # errors from the shared parse/table plumbing BEFORE either
        # entropy path runs (pre-existing scalar behavior; the decode
        # stage's per-record tolerance M9 catches any exception) — the
        # parity contract is same-exception, whatever it is
        try:
            return ("ok", decode_jfif(d))
        except Exception as e:
            return (type(e).__name__, str(e))

    for trial in range(120):
        mode = trial % 3
        if mode == 0:
            d = b"\xff\xd8" + bytes(
                rng.integers(0, 256, int(rng.integers(10, 400)), dtype=np.uint8)
            )
        elif mode == 1:
            m = bytearray(base)
            for _ in range(int(rng.integers(1, 8))):
                m[int(rng.integers(2, len(m)))] = int(rng.integers(0, 256))
            d = bytes(m)
        else:
            d = base[: int(rng.integers(4, len(base)))]
        ra = run(d)
        orig = jfif._native_baseline_scan
        jfif._native_baseline_scan = lambda *a: False
        try:
            rb = run(d)
        finally:
            jfif._native_baseline_scan = orig
        assert ra[0] == rb[0]
        if ra[0] == "ok":
            np.testing.assert_array_equal(ra[1], rb[1])
        else:
            assert ra[1] == rb[1]


def test_no_native_env_pins_python_path(monkeypatch):
    monkeypatch.setenv("IDF_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_tried", False)
    assert native.get_lib() is None
    # and the decoder still works through the Python loop
    img = np.full((24, 24, 3), 128, dtype=np.uint8)
    out = decode_jfif(encode_jfif(img, quality=90))
    assert out.shape == (24, 24, 3)
    monkeypatch.setattr(native, "_lib_tried", False)  # re-probe for later tests


def test_hash_values_unchanged_by_native_path():
    """The engine contract: identical phash regardless of decode path."""
    from idf.kernels.hashes import hash_bytes

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (250, 300, 3), dtype=np.uint8)
    data = encode_jfif(img, quality=88)
    ha = hash_bytes(data, "phash")
    orig = jfif._native_baseline_scan
    jfif._native_baseline_scan = lambda *a: False
    try:
        hb = hash_bytes(data, "phash")
    finally:
        jfif._native_baseline_scan = orig
    assert ha == hb
