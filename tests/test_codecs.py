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
