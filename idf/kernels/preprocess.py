"""Grayscale + bilinear-resize preprocessing shared by all three hashers.

Reference pipeline (per hasher): ``Gray.toGray`` (AWT byte-gray,
/root/reference/src/main/java/core/Gray.java:6-10) then bilinear
``Resize`` (/root/reference/src/main/java/core/Resize.java:6-13), then the
hashers re-extract luma from the already-gray pixels (identity when
R=G=B, e.g. hash/AHash.java:16-22).

Java AWT's colorspace conversion and bilinear filter are not
bit-reproducible outside the JVM, so — per SURVEY.md §5/§7 — this engine
defines its own deterministic equivalents (ITU-R 601 luma applied once;
pixel-center-aligned bilinear) and conformance versus the reference is
measured at the cluster/pair level (dup-pair recall >= 0.99), while the
engine and the pure-Python oracle share these exact kernels bit-for-bit.
"""

from __future__ import annotations

import numpy as np


def luma601_u8(img: np.ndarray) -> np.ndarray:
    """RGB uint8 (H, W, 3) -> gray uint8 (H, W) via ITU-R 601 luma.

    Rounded (not truncated) to uint8: the truncation in the reference's
    hashers (``(int)(0.299r+...)``, AHash.java:21) happens on the
    *post-resize* sample and is applied by the hash kernels' quantize
    step, not here.
    """
    f = img.astype(np.float32)  # exact for 8-bit inputs, half the traffic
    y = (
        np.float32(0.299) * f[..., 0]
        + np.float32(0.587) * f[..., 1]
        + np.float32(0.114) * f[..., 2]
    )
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample a 2-D float/uint8 array to (out_h, out_w), float64 out.

    Pixel-center alignment: dst center d maps to src coordinate
    ``(d + 0.5) * (in/out) - 0.5``, clamped — the standard convention
    (matches PIL / most libraries; AWT differs at edges, which is
    covered by the cluster-level conformance bar, see module docstring).
    """
    in_h, in_w = img.shape
    src = img.astype(np.float64)
    if (in_h, in_w) == (out_h, out_w):
        return src.copy()

    def _axis(in_n: int, out_n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        x = (np.arange(out_n) + 0.5) * (in_n / out_n) - 0.5
        x = np.clip(x, 0.0, in_n - 1.0)
        lo = np.floor(x).astype(np.int64)
        hi = np.minimum(lo + 1, in_n - 1)
        return lo, hi, x - lo

    y0, y1, wy = _axis(in_h, out_h)
    x0, x1, wx = _axis(in_w, out_w)
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    return top * (1 - wy[:, None]) + bot * wy[:, None]
