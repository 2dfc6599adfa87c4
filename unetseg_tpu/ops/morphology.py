"""Binary morphology as min/max pooling — the TPU-native form.

OpenCV's ``morphologyEx(MORPH_OPEN)`` with a 3x3 rect kernel
(``/root/reference/src/postprocess.cpp:57-60``) is erosion followed by
dilation.  On TPU these are ``lax.reduce_window`` min/max with a 3x3 window —
one fused VPU pass each, no im2col, no scalar loops.

Border semantics match OpenCV's defaults (``morphologyDefaultBorderValue``):
erosion pads with +inf (border pixels are NOT eroded away by the image edge),
dilation pads with -inf.  For boolean masks that is pad-True / pad-False.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _window(x: jax.Array, init, op, size: int) -> jax.Array:
    if size < 1 or size % 2 == 0:
        # size//2 padding is shape-preserving only for odd sizes; an even
        # size silently returned (H+1, W+1) with shifted geometry
        raise ValueError(f"morphology window size must be odd >= 1, "
                         f"got {size}")
    pad = size // 2
    nd = x.ndim
    window = (1,) * (nd - 2) + (size, size)
    strides = (1,) * nd
    padding = ((0, 0),) * (nd - 2) + (((pad, pad),) * 2)
    return lax.reduce_window(x, init, op, window, strides, padding)


def erode(mask: jax.Array, size: int = 3) -> jax.Array:
    """Binary erosion; (..., H, W) bool -> bool."""
    return _window(mask.astype(jnp.bool_), True, lax.bitwise_and, size)


def dilate(mask: jax.Array, size: int = 3) -> jax.Array:
    """Binary dilation; (..., H, W) bool -> bool."""
    return _window(mask.astype(jnp.bool_), False, lax.bitwise_or, size)


def open_(mask: jax.Array, size: int = 3) -> jax.Array:
    """Morphological opening (erode then dilate), OpenCV MORPH_OPEN parity."""
    return dilate(erode(mask, size), size)
