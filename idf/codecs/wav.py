"""Pure-numpy RIFF/WAVE (WAV) codec — real audio decode, no external libs.

Replaces the audio stub flagged in round 2 (idf/functions/media.py):
WAV/PCM is a public container that parses with ``struct`` + numpy alone,
so the audio operators get a REAL decode path in-sandbox, the same way
FJPG/JFIF did for images. Supports the two PCM encodings that cover
virtually all raw WAV in the wild: format 1 (integer PCM, 8/16/24/32
bit) and format 3 (IEEE float32/float64), any channel count, with
proper chunk walking (LIST/fact/unknown chunks skipped, word-aligned).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RIFF"


class WavError(ValueError):
    pass


def _chunks(data: bytes):
    """Yield (fourcc, payload_offset, payload_len) for each RIFF chunk."""
    n = len(data)
    pos = 12  # past RIFF....WAVE
    while pos + 8 <= n:
        cc = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        yield cc, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned


def wav_info(data) -> dict:
    """Header-only parse: sample_rate, n_channels, bits, fmt_code,
    n_samples (per channel), data_offset, data_len."""
    data = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    if data[:4] != MAGIC or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    fmt = None
    dofs = dlen = None
    for cc, ofs, ln in _chunks(data):
        if cc == b"fmt " and ln >= 16:
            code, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", data, ofs)
            fmt = (code, ch, sr, bits)
        elif cc == b"data":
            dofs, dlen = ofs, min(ln, len(data) - ofs)
    if fmt is None or dofs is None:
        raise WavError("missing fmt/data chunk")
    code, ch, sr, bits = fmt
    if code not in (1, 3):
        raise WavError(f"unsupported WAV format code {code} (PCM/float only)")
    bytes_per = bits // 8
    if bytes_per == 0 or ch == 0:
        raise WavError("bad fmt chunk")
    n_samples = dlen // (bytes_per * ch)
    return {
        "fmt_code": code,
        "n_channels": ch,
        "sample_rate": sr,
        "bits": bits,
        "n_samples": n_samples,
        "data_offset": dofs,
        "data_len": n_samples * bytes_per * ch,
    }


def decode_wav(data) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1], shape (n, channels),
    sample_rate). Fully vectorized (one frombuffer + scale)."""
    data = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    info = wav_info(data)
    raw = data[info["data_offset"] : info["data_offset"] + info["data_len"]]
    bits, code, ch = info["bits"], info["fmt_code"], info["n_channels"]
    if code == 3:
        dt = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(raw, dtype="<" + np.dtype(dt).char).astype(np.float32)
    elif bits == 8:  # unsigned, offset-binary
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = (v << 8) >> 8  # sign-extend 24 -> 32
        x = v.astype(np.float32) / 8388608.0
    elif bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise WavError(f"unsupported bit depth {bits}")
    return x.reshape(-1, ch), info["sample_rate"]


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) -> WAV bytes (PCM16 or
    float32)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if bits == 16:
        payload = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
        code, ba = 1, 2 * ch
    elif bits == 32:
        payload = x.astype("<f4").tobytes()
        code, ba = 3, 4 * ch
    else:
        raise WavError("encode supports 16-bit PCM or 32-bit float")
    fmt = struct.pack("<HHIIHH", code, ch, int(sample_rate), int(sample_rate) * ba, ba, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
