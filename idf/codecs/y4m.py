"""Pure-numpy YUV4MPEG2 (.y4m) codec — real video decode, no external libs.

Replaces the video stub flagged in round 2 (idf/functions/media.py):
YUV4MPEG2 is the public uncompressed video container (mjpegtools /
ffmpeg's ``-f yuv4mpeg``) — a single ASCII stream header followed by
``FRAME\\n`` + raw planes per frame. Because every frame in a stream has
the same byte size, frame k is addressable at a computed offset: the
sampler decodes ONLY the frames it samples, never the whole clip — the
actual scale property a 100-TB frame-sampling stage needs (byte-range
reads per sampled frame instead of full-clip decode).

Supported colorspaces: C420 (+jpeg/mpeg2/paldv tags), C422, C444, Cmono.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"YUV4MPEG2"


class Y4mError(ValueError):
    pass


_SUBSAMPLE = {
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _plane_dims(w: int, h: int, cs: str) -> tuple[int, int]:
    sub = _SUBSAMPLE[cs]
    if sub is None:
        return 0, 0
    return -(-w // sub[0]), -(-h // sub[1])


def y4m_info(data) -> dict:
    """Parse the stream header: w, h, fps (num, den), colorspace,
    header_len, frame_size (bytes incl. FRAME marker), n_frames."""
    data = bytes(data[:256]) if not isinstance(data, (bytes, bytearray)) else data
    if data[: len(MAGIC)] != MAGIC:
        raise Y4mError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise Y4mError("unterminated stream header")
    w = h = None
    fps = (30, 1)
    cs = "420"
    for tok in data[len(MAGIC) : nl].split(b" "):
        if not tok:
            continue
        c, v = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if c == "W":
            w = int(v)
        elif c == "H":
            h = int(v)
        elif c == "F":
            num, den = v.split(":")
            fps = (int(num), int(den))
        elif c == "C":
            # '420jpeg'/'420mpeg2'/'420paldv' all share 4:2:0 geometry
            cs = "mono" if v.startswith("mono") else v[:3]
    if w is None or h is None:
        raise Y4mError("missing W/H in stream header")
    if cs not in _SUBSAMPLE:
        raise Y4mError(f"unsupported colorspace C{cs}")
    cw, ch_ = _plane_dims(w, h, cs)
    plane_bytes = w * h + 2 * cw * ch_
    return {
        "w": w,
        "h": h,
        "fps_num": fps[0],
        "fps_den": fps[1],
        "colorspace": cs,
        "header_len": nl + 1,
        "plane_bytes": plane_bytes,
        "chroma_dims": (ch_, cw),
    }


def _frame_offset(info: dict, data_len: int, idx: int) -> int:
    """Offset of frame ``idx``'s FRAME line (fixed-size frames — true
    for any single-header stream, which is all the format allows)."""
    return info["header_len"] + idx * (6 + info["plane_bytes"])


def y4m_frame_count(data) -> int:
    info = y4m_info(data)
    return (len(data) - info["header_len"]) // (6 + info["plane_bytes"])


def decode_y4m_frame(data, idx: int) -> np.ndarray:
    """Random-access decode of ONE frame's luma plane -> uint8 (h, w).

    Touches only ``plane_bytes`` bytes at a computed offset — the seek
    property the frame sampler relies on.
    """
    data = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    info = y4m_info(data)
    ofs = _frame_offset(info, len(data), idx)
    if ofs + 6 + info["plane_bytes"] > len(data):
        raise Y4mError(f"frame {idx} out of range")
    if data[ofs : ofs + 5] != b"FRAME":
        raise Y4mError("bad FRAME marker (frame parameters unsupported)")
    start = ofs + 6
    y = np.frombuffer(data, dtype=np.uint8, count=info["w"] * info["h"], offset=start)
    return y.reshape(info["h"], info["w"]).copy()


def decode_y4m(data) -> tuple[np.ndarray, dict]:
    """Full decode of all luma planes -> (uint8 (n, h, w), info)."""
    data = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    info = y4m_info(data)
    n = y4m_frame_count(data)
    out = np.empty((n, info["h"], info["w"]), dtype=np.uint8)
    for i in range(n):
        out[i] = decode_y4m_frame(data, i)
    return out, info


def encode_y4m(
    frames_y: np.ndarray,
    fps: tuple[int, int] = (30, 1),
    colorspace: str = "420",
    chroma: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """uint8 luma frames (n, h, w) -> .y4m bytes. ``chroma`` supplies
    (cb, cr) stacks at the subsampled dims; gray (constant 128) chroma
    is synthesized when omitted for non-mono colorspaces."""
    f = np.ascontiguousarray(frames_y, dtype=np.uint8)
    if f.ndim != 3:
        raise Y4mError("frames_y must be (n, h, w) uint8")
    n, h, w = f.shape
    cs = "mono" if colorspace == "mono" else colorspace
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n".encode()
    parts = [head]
    if cs == "mono":
        for i in range(n):
            parts.append(b"FRAME\n")
            parts.append(f[i].tobytes())
        return b"".join(parts)
    ch_, cw = _plane_dims(w, h, cs)
    if chroma is None:
        flat = np.full((ch_, cw), 128, dtype=np.uint8).tobytes()
        cbs = crs = [flat] * n
    else:
        cbs = [np.ascontiguousarray(chroma[0][i], dtype=np.uint8).tobytes() for i in range(n)]
        crs = [np.ascontiguousarray(chroma[1][i], dtype=np.uint8).tobytes() for i in range(n)]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(f[i].tobytes())
        parts.append(cbs[i])
        parts.append(crs[i])
    return b"".join(parts)
