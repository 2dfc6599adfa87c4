"""Mask cleanup pipeline, fully on-device.

Exact reimplementation of ``/root/reference/src/postprocess.cpp`` as one
jittable XLA program (vmap-able over a batch):

1. **hole fill** (postprocess.cpp:13-44): 8-connected components of the
   *inverse* of the foreground (mask == 2); any component whose bbox touches
   no image border AND whose area < ``int(w*h*0.06f)`` is filled to 2,
2. **binarize + 3x3 MORPH_OPEN** (postprocess.cpp:57-60),
3. **component area filter** (postprocess.cpp:63-72): keep 8-connected
   components with area >= the same threshold,
4. **remap to {0, 2}** (postprocess.cpp:75-76).

The area threshold reproduces the C++ float32 arithmetic
(``static_cast<int>(w * h * 0.06f)``) exactly, including the float32
representation of 0.06.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from unetseg_tpu.ops import cc, morphology

FOREGROUND_VALUE = 2
MORPH_KERNEL_SIZE = 3
MIN_AREA_RATIO = np.float32(0.06)


def min_area_threshold(h: int, w: int) -> int:
    """int(w * h * 0.06f) with C++ float32 semantics (postprocess.cpp:30,66)."""
    return int(np.float32(w * h) * MIN_AREA_RATIO)


def _cc_with_stats(fg: jax.Array, use_pallas: bool):
    if use_pallas:
        from unetseg_tpu.ops.cc_pallas import cc_label_pallas

        lbl = cc_label_pallas(fg)
        return lbl, cc.cc_stats(fg, lbl)
    return cc.connected_components_with_stats(fg)


def fill_holes_inside_foreground(mask: jax.Array,
                                 use_pallas_cc: bool = False) -> jax.Array:
    """(H, W) uint8 label mask -> mask with interior holes set to 2."""
    h, w = mask.shape
    min_area = min_area_threshold(h, w)
    fg = mask == FOREGROUND_VALUE
    inv = ~fg
    lbl, stats = _cc_with_stats(inv, use_pallas_cc)
    is_hole = (
        (stats.min_col > 0)
        & (stats.min_row > 0)
        & (stats.max_col < w - 1)
        & (stats.max_row < h - 1)
        & (stats.area < min_area)
    )
    fill = is_hole[lbl.reshape(-1)].reshape(h, w) & inv
    return jnp.where(fill, jnp.uint8(FOREGROUND_VALUE), mask)


def postprocess_mask(mask: jax.Array, use_pallas_cc: bool = False) -> jax.Array:
    """(H, W) uint8 class mask -> cleaned {0, 2} uint8 mask (one XLA program).

    ``use_pallas_cc`` routes the two CCL passes through the VMEM-resident
    segmented-scan kernel (ops/cc_pallas.py) — device postprocess v2,
    ~40x faster labeling on TPU; identical labels (oracle-tested).
    """
    h, w = mask.shape
    min_area = min_area_threshold(h, w)

    mask = fill_holes_inside_foreground(mask, use_pallas_cc)

    fg = morphology.open_(mask == FOREGROUND_VALUE, MORPH_KERNEL_SIZE)

    if use_pallas_cc:
        from unetseg_tpu.ops.cc_pallas import cc_label_pallas

        lbl = cc_label_pallas(fg)
    else:
        lbl = cc.cc_label(fg)
    keep_seg = cc.cc_area(fg, lbl) >= min_area
    keep = keep_seg[lbl.reshape(-1)].reshape(h, w) & fg

    return jnp.where(keep, jnp.uint8(FOREGROUND_VALUE), jnp.uint8(0))


@functools.partial(jax.jit, static_argnames=("use_pallas_cc",))
def postprocess_mask_jit(mask: jax.Array,
                         use_pallas_cc: bool = False) -> jax.Array:
    return postprocess_mask(mask, use_pallas_cc)


@functools.partial(jax.jit, static_argnames=("use_pallas_cc",))
def postprocess_batch(masks: jax.Array,
                      use_pallas_cc: bool = False) -> jax.Array:
    """(N, H, W) uint8 -> (N, H, W) uint8, vmapped over the batch."""
    return jax.vmap(
        functools.partial(postprocess_mask, use_pallas_cc=use_pallas_cc)
    )(masks)
