"""ITU-T T.871 (JFIF) color conversion between RGB and YCbCr.

Capability parity with the reference `tools/tools.py:705-763` (rgb_to_ycbcr) and
`tools/tools.py` ycbcr_to_rgb: full-range conversion where [0,255] RGB maps to
[0,255] Y/Cb/Cr.  Implemented as pure functions over numpy or jax arrays so the
same code path can run on host (dataset creation) or on TPU (batched inside a
jit region).
"""

from __future__ import annotations

import numpy as np


def cast_float_to_uint8(x):
    """Rounds to nearest and saturates to [0, 255] (reference tools.py cast_float_to_uint8)."""
    xp = _xp(x)
    return xp.clip(xp.round(x), 0.0, 255.0).astype(xp.uint8)


def _xp(x):
    # Dispatch numpy vs jax.numpy without importing jax at module load for host-only use.
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def rgb_to_ycbcr(rgb_uint8):
    """Converts an RGB image (H, W, 3) uint8 to YCbCr uint8 per ITU-T T.871.

    The exact coefficient layout follows JFIF:
      Y  =  0.299 R + 0.587 G + 0.114 B
      Cb = 128 - (0.299/1.772) R - (0.587/1.772) G + (0.886/1.772) B
      Cr = 128 + (0.701/1.402) R - (0.587/1.402) G - (0.114/1.402) B
    """
    xp = _xp(rgb_uint8)
    if rgb_uint8.dtype != xp.uint8:
        raise TypeError("`rgb_uint8.dtype` is not uint8.")
    if rgb_uint8.ndim != 3 or rgb_uint8.shape[2] != 3:
        raise ValueError("`rgb_uint8` must have shape (H, W, 3).")
    rgb = rgb_uint8.astype(xp.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - (0.299 / 1.772) * r - (0.587 / 1.772) * g + (0.886 / 1.772) * b
    cr = 128.0 + (0.701 / 1.402) * r - (0.587 / 1.402) * g - (0.114 / 1.402) * b
    ycbcr = xp.stack((y, cb, cr), axis=2)
    return cast_float_to_uint8(ycbcr)


def ycbcr_to_rgb(ycbcr_uint8):
    """Converts a YCbCr image (H, W, 3) uint8 to RGB uint8 per ITU-T T.871 (inverse of rgb_to_ycbcr)."""
    xp = _xp(ycbcr_uint8)
    if ycbcr_uint8.dtype != xp.uint8:
        raise TypeError("`ycbcr_uint8.dtype` is not uint8.")
    if ycbcr_uint8.ndim != 3 or ycbcr_uint8.shape[2] != 3:
        raise ValueError("`ycbcr_uint8` must have shape (H, W, 3).")
    ycbcr = ycbcr_uint8.astype(xp.float64)
    y, cb, cr = ycbcr[:, :, 0], ycbcr[:, :, 1], ycbcr[:, :, 2]
    r = y + 1.402 * (cr - 128.0)
    g = y - (0.114 * 1.772 / 0.587) * (cb - 128.0) - (0.299 * 1.402 / 0.587) * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = xp.stack((r, g, b), axis=2)
    return cast_float_to_uint8(rgb)
