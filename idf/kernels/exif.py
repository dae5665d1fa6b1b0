"""EXIF orientation normalization (M1).

Reference analog: core/Exif.java:35-131 — the 8-case dispatch on EXIF
tag 274 (public spec):

  1 = identity                 5 = transpose  (mirror-H then rot270 CW)
  2 = mirror horizontal        6 = rotate 90 CW
  3 = rotate 180               7 = transverse (mirror-H then rot90 CW)
  4 = mirror vertical          8 = rotate 270 CW

Out-of-range values are treated as 1 (Exif.java:66-77 `default -> src`),
and the shipped reference reads orientation as a constant 1
(`readOrientationSafe`, Exif.java:57-59), so a source without an
``orientation`` column is bit-compatible with the reference pipeline.
Channel axes (incl. alpha) pass through untouched — the AWT
`chooseType` alpha-preservation contract (Exif.java:119-121), covered
by the ported `testAlphaIsPreserved`.

All eight transforms are pure numpy views + one `ascontiguousarray`,
so the per-image cost is a single copy.
"""

from __future__ import annotations

import numpy as np


def exif_transform(img: np.ndarray, orientation: int) -> np.ndarray:
    """Apply EXIF orientation 1..8 to an (H, W[, C]) array.

    Returns the input object itself for identity/unknown orientations
    (Exif.java `case 1 -> src`); otherwise a C-contiguous new array.
    """
    o = int(orientation)
    if o == 2:
        out = img[:, ::-1]
    elif o == 3:
        out = img[::-1, ::-1]
    elif o == 4:
        out = img[::-1, :]
    elif o == 5:
        out = img.swapaxes(0, 1)  # transpose
    elif o == 6:
        out = np.rot90(img, k=-1)  # 90 CW
    elif o == 7:
        # transverse = anti-transpose: out[i, j] = img[H-1-j, W-1-i]
        out = img[::-1, ::-1].swapaxes(0, 1)
    elif o == 8:
        out = np.rot90(img, k=1)  # 270 CW == 90 CCW
    else:  # 1 and anything out of range: identity
        return img
    return np.ascontiguousarray(out)


def inverse_orientation(orientation: int) -> int:
    """The orientation that undoes ``orientation`` (6 <-> 8; the other
    six are involutions)."""
    o = int(orientation)
    return {6: 8, 8: 6}.get(o, o if 1 <= o <= 8 else 1)
