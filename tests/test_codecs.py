import numpy as np
import pytest

from idf.codecs import DecodeError, decode, encode, sniff
from idf.codecs.png import decode_png, encode_png


def _rand_img(shape=(61, 47, 3), seed=1):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["png", "bmp"])
def test_lossless_roundtrip(fmt):
    img = _rand_img()
    data = encode(img, fmt)
    assert sniff(data) == fmt
    assert np.array_equal(decode(data), img)


def test_png_gray_and_rgba():
    gray = _rand_img((20, 30), seed=2)
    out = decode_png(encode_png(gray))
    assert out.shape == (20, 30, 3)
    assert np.array_equal(out[..., 0], gray)
    rgba = _rand_img((15, 9, 4), seed=3)
    out = decode_png(encode_png(rgba))
    assert np.array_equal(out, rgba[..., :3])


def test_png_filter_decode():
    """Decoder handles all five scanline filters (hand-built IDAT)."""
    import struct
    import zlib

    from idf.codecs.png import MAGIC, _chunk

    img = _rand_img((6, 5, 3), seed=4)
    h, w, c = img.shape
    rows = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = y % 5
        enc = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            a = line[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if f == 0:
                enc[i] = line[i]
            elif f == 1:
                enc[i] = line[i] - a
            elif f == 2:
                enc[i] = line[i] - b
            elif f == 3:
                enc[i] = line[i] - ((a + b) >> 1)
            else:
                p = a + b - cc
                pa, pb, pc2 = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc2) else (b if pb <= pc2 else cc)
                enc[i] = line[i] - pred
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_fjpg_quality_ladder():
    yy, xx = np.mgrid[0:96, 0:96]
    img = np.stack(
        [(xx * 2) % 256, (yy * 2) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    hi = decode(encode(img, "jpg", quality=90))
    lo = decode(encode(img, "jpg", quality=30))
    assert _psnr(img, hi) >= 40.0  # BASELINE.json fidelity bar for lossy
    assert _psnr(img, lo) < _psnr(img, hi)
    assert _psnr(img, lo) > 25.0


def test_decode_errors():
    with pytest.raises(DecodeError):
        decode(b"not an image at all")
    good = encode(_rand_img(), "png")
    with pytest.raises(DecodeError):
        decode(good[:40])  # truncated after valid magic


def test_png_luma_fused_bit_exact():
    """decode_png_luma == luma601_u8(decode_png(...)) bit-for-bit on
    RGB, RGBA and gray images (and via memoryview input)."""
    from idf.codecs.png import decode_png_luma
    from idf.kernels.preprocess import luma601_u8

    for shape, seed in (((61, 47, 3), 1), ((15, 9, 4), 3), ((20, 30), 2)):
        img = _rand_img(shape, seed=seed)
        data = encode_png(img)
        ref = decode_png(data)
        want = luma601_u8(ref)
        assert np.array_equal(decode_png_luma(data), want)
        assert np.array_equal(decode_png_luma(memoryview(data)), want)


def test_luma601_gray_identity_exhaustive():
    """luma601(x,x,x) == x for every uint8 x — the invariant the fused
    gray-PNG fast path relies on (float32 0.299+0.587+0.114 sums to 1.0
    in the evaluation order used)."""
    from idf.kernels.preprocess import luma601_u8

    x = np.arange(256, dtype=np.uint8)
    img = np.repeat(x.reshape(16, 16, 1), 3, axis=2)
    assert np.array_equal(luma601_u8(img), x.reshape(16, 16))


def test_png_luma_fused_filtered_fallback():
    """Filtered PNGs (non-zero filter bytes) fall back to the general
    decoder and still match."""
    import struct
    import zlib

    from idf.codecs.png import MAGIC, _chunk, decode_png_luma
    from idf.kernels.preprocess import luma601_u8

    # one row filter-2 (Up) image, 3x2 RGB
    rows = [b"\x00" + bytes(range(6)), b"\x02" + bytes(range(6))]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png_luma(data), luma601_u8(decode_png(data)))


def test_real_jpeg_seam():
    """Real JPEG/JFIF bytes are recognized and route to the optional
    Pillow codec; without Pillow they raise DecodeError (-> per-row
    skip), never an unhandled crash (core/ImageLoader.java:7-11 seam)."""
    from idf.codecs import decode_luma, decode_luma_scaled

    fake_jfif = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    assert sniff(fake_jfif) == "jfif"
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        for fn in (decode, decode_luma, lambda d: decode_luma_scaled(d, 16)):
            with pytest.raises(DecodeError, match="JPEG codec"):
                fn(fake_jfif)
