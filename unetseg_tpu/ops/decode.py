"""Argmax decode of UNet logits to a class-label mask.

Reference (``/root/reference/src/process.cpp:157-171``): per-class
``cv::compare(CMP_GT)`` against a running max initialized to -FLT_MAX over a
**hard-coded 3 classes** — strict ``>`` means ties resolve to the *lowest*
class index.  ``jnp.argmax`` also returns the first occurrence of the maximum,
so the tie-break matches exactly.  (NaN logits would differ — CMP_GT never
selects NaN while argmax propagates it — but the network cannot emit NaN from
finite inputs; documented, not handled.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_mask(logits: jax.Array, num_classes: int = 3) -> jax.Array:
    """(..., H, W, C) float logits -> (..., H, W) uint8 label mask.

    Only the first ``num_classes`` channels participate, mirroring the
    reference's fixed ``c < 3`` loop even when the engine reports more
    channels (src/process.cpp:162).
    """
    return jnp.argmax(logits[..., :num_classes], axis=-1).astype(jnp.uint8)


def mask_to_image(mask: jax.Array) -> jax.Array:
    """Visualization LUT 0->0, 1->128, 2->255 (src/process.cpp:178-185)."""
    lut = jnp.zeros((256,), jnp.uint8).at[1].set(128).at[2].set(255)
    return lut[mask.astype(jnp.int32)]


_LUT_NP = None


def mask_to_image_np(mask) -> "np.ndarray":
    """Host twin of :func:`mask_to_image` — pure NumPy.

    The engine's artifact loops run on HOST masks; routing them through the
    jnp LUT dispatched one device op + D2H sync per slice (~28 ms each
    through a tunneled backend), serializing against the inference stream
    (round-4 review finding)."""
    import numpy as np

    global _LUT_NP
    if _LUT_NP is None:
        lut = np.zeros(256, np.uint8)
        lut[1], lut[2] = 128, 255
        _LUT_NP = lut
    return _LUT_NP[np.asarray(mask, np.uint8)]
