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


def postprocess_mask(mask: jax.Array, use_pallas_cc: bool = False,
                     interpret: bool = False) -> jax.Array:
    """(H, W) uint8 class mask -> cleaned {0, 2} uint8 mask (one XLA program).

    ``use_pallas_cc`` routes to the scatter-lean device fast path
    (:func:`_postprocess_mask_pallas`) — device postprocess v3; the XLA
    branch below is the readable oracle the fast path is tested against.
    """
    if use_pallas_cc:
        return _postprocess_mask_pallas(mask, interpret=interpret)

    h, w = mask.shape
    min_area = min_area_threshold(h, w)

    mask = fill_holes_inside_foreground(mask, use_pallas_cc=False)

    fg = morphology.open_(mask == FOREGROUND_VALUE, MORPH_KERNEL_SIZE)

    lbl = cc.cc_label(fg)
    keep_seg = cc.cc_area(fg, lbl) >= min_area
    keep = keep_seg[lbl.reshape(-1)].reshape(h, w) & fg

    return jnp.where(keep, jnp.uint8(FOREGROUND_VALUE), jnp.uint8(0))


def _region_predicate(region: jax.Array, slot_bit: jax.Array,
                      lbl: jax.Array, idx: jax.Array,
                      interpret: bool) -> jax.Array:
    """Broadcast a per-root predicate to every pixel of its component
    WITHOUT a 262k-element table gather (the ~3 ms/mask XLA gather the
    profile pinned down — benchmarks/exp_devpost_profile.py).

    Each component's root pixel (lbl == idx, i.e. the pixel whose flat
    index IS the root label) seeds ``root*2 + (0 if predicate else 1)``;
    every other member seeds the neutral ``root*2 + 1``.  One segmented
    min-propagation (the CCL kernel on custom seeds) floods the component
    with its minimum, so bit 0 of the result is the root's predicate.
    """
    from unetseg_tpu.ops.cc_pallas import propagate_min_pallas

    h, w = region.shape
    sent2 = 2 * h * w + 2
    is_root = lbl == idx
    seed = lbl * 2 + jnp.where(is_root & slot_bit, 0, 1)
    packed = propagate_min_pallas(
        jnp.where(region, seed, sent2), sentinel=sent2, interpret=interpret)
    return region & ((packed & 1) == 0)


def _postprocess_mask_pallas(mask: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Device postprocess v3 — same semantics as the XLA oracle above
    (postprocess.cpp:47-79), restructured for the TPU's scatter aversion:

    * per-component stats shrink from five 262k-element scatters
      (cc.cc_stats, measured 18.3 ms/mask) to ONE area scatter-add plus a
      ~2k-element border-label scatter ("bbox touches no border" is
      equivalent to "contains no border pixel" for a connected set);
    * the two predicate table-gathers (3 ms/mask each) become
      min-propagation passes in VMEM (~1 ms, :func:`_region_predicate`).
    """
    from unetseg_tpu.ops.cc_pallas import cc_label_pallas

    h, w = mask.shape
    size = h * w
    min_area = min_area_threshold(h, w)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))

    # --- hole fill (postprocess.cpp:13-44) -------------------------------
    inv = mask != FOREGROUND_VALUE
    lbl = cc_label_pallas(inv, interpret=interpret)
    area = jnp.zeros((size + 1,), jnp.int32).at[lbl.reshape(-1)].add(
        inv.reshape(-1).astype(jnp.int32))
    border_lbl = jnp.concatenate([lbl[0], lbl[-1], lbl[:, 0], lbl[:, -1]])
    touch = jnp.zeros((size + 1,), jnp.bool_).at[border_lbl].set(True)
    hole_slot = ((area[:size] < min_area) & ~touch[:size]).reshape(h, w)
    fill = _region_predicate(inv, hole_slot, lbl, idx, interpret)
    mask = jnp.where(fill, jnp.uint8(FOREGROUND_VALUE), mask)

    # --- binarize + open + component area filter (postprocess.cpp:57-76) -
    fg = morphology.open_(mask == FOREGROUND_VALUE, MORPH_KERNEL_SIZE)
    lbl2 = cc_label_pallas(fg, interpret=interpret)
    area2 = jnp.zeros((size + 1,), jnp.int32).at[lbl2.reshape(-1)].add(
        fg.reshape(-1).astype(jnp.int32))
    keep_slot = (area2[:size] >= min_area).reshape(h, w)
    keep = _region_predicate(fg, keep_slot, lbl2, idx, interpret)

    return jnp.where(keep, jnp.uint8(FOREGROUND_VALUE), jnp.uint8(0))


# ---------------------------------------------------------------------------
# Device postprocess v4: slot-compressed component stats (VERDICT r3 item 6)
# ---------------------------------------------------------------------------

_K_SLOTS = 128


def _slot_roots(lbl: jax.Array, region: jax.Array):
    """Up to K component roots as a STATIC-size vector (padded -1).

    A component's root label is its minimum member flat index, so roots are
    exactly the pixels whose label equals their own index.  nonzero(size=K)
    compiles to a bounded cumsum — no data-dependent shapes."""
    h, w = lbl.shape
    size = h * w
    idx = jnp.arange(size, dtype=jnp.int32)
    is_root = region.reshape(-1) & (lbl.reshape(-1) == idx)
    n_roots = jnp.sum(is_root.astype(jnp.int32))
    roots = jnp.nonzero(is_root, size=_K_SLOTS, fill_value=-1)[0].astype(
        jnp.int32)
    return roots, n_roots


def _region_predicate_fast(lbl: jax.Array, region: jax.Array,
                           min_area: int, mode: str) -> jax.Array:
    """Per-pixel component predicate without scatters, gathers or floods.

    v3 spent ~3.5 ms/mask on a 262k-update scatter-add (areas) plus ~1 ms
    min-propagation per predicate (exp_devpost_profile.py).  v4 compresses
    components into K=128 static slots (real masks have a handful) and
    evaluates areas / border-touch / the predicate as K-row compare-reduce
    sweeps — pure VPU streaming.  Caller guarantees <= K components
    (overflow routes to :func:`_region_predicate_exact` at batch level).
    """
    h, w = lbl.shape
    flat = lbl.reshape(-1)
    roots, _ = _slot_roots(lbl, region)
    eq = flat[None, :] == roots[:, None]               # (K, HW)
    area_k = jnp.sum(eq, axis=1, dtype=jnp.int32)
    if mode == "hole":
        border = jnp.concatenate([lbl[0], lbl[-1], lbl[:, 0], lbl[:, -1]])
        touch_k = jnp.any(border[None, :] == roots[:, None], axis=1)
        slot_ok = (area_k < min_area) & ~touch_k
    else:
        slot_ok = area_k >= min_area
    slot_ok &= roots >= 0
    return jnp.any(eq & slot_ok[:, None], axis=0).reshape(h, w) & region


def _region_predicate_exact(lbl: jax.Array, region: jax.Array,
                            min_area: int, mode: str) -> jax.Array:
    """Scatter/gather table form (exact for ANY component count); only used
    when a batch contains a > K-component mask (adversarial speckle)."""
    h, w = lbl.shape
    size = h * w
    flat = lbl.reshape(-1)
    area = jnp.zeros((size + 1,), jnp.int32).at[flat].add(
        region.reshape(-1).astype(jnp.int32))
    if mode == "hole":
        border = jnp.concatenate([lbl[0], lbl[-1], lbl[:, 0], lbl[:, -1]])
        touch = jnp.zeros((size + 1,), jnp.bool_).at[border].set(True)
        table = (area[:size] < min_area) & ~touch[:size]
    else:
        table = area[:size] >= min_area
    return table[flat].reshape(h, w) & region


def _batch_predicate(lbl: jax.Array, region: jax.Array, min_area: int,
                     mode: str) -> jax.Array:
    """Batched predicate with ONE cond at batch level: the slot fast path
    runs unless ANY mask in the batch has > K components (vmap of cond
    would execute both branches; a real branch needs the cond OUTSIDE)."""
    n_roots = jax.vmap(lambda l, r: _slot_roots(l, r)[1])(lbl, region)
    fast = functools.partial(_region_predicate_fast, min_area=min_area,
                             mode=mode)
    exact = functools.partial(_region_predicate_exact, min_area=min_area,
                              mode=mode)
    return jax.lax.cond(
        jnp.max(n_roots) <= _K_SLOTS,
        lambda args: jax.vmap(fast)(*args),
        lambda args: jax.vmap(exact)(*args),
        (lbl, region),
    )


def _postprocess_masks_v4(masks: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """(N, H, W) uint8 -> cleaned {0,2}; exact postprocess.cpp semantics."""
    from unetseg_tpu.ops.cc_pallas import cc_label_pallas

    n, h, w = masks.shape
    min_area = min_area_threshold(h, w)

    # --- hole fill ---------------------------------------------------------
    inv = masks != FOREGROUND_VALUE
    lbl = cc_label_pallas(inv, interpret=interpret)
    fill = _batch_predicate(lbl, inv, min_area, "hole")
    masks = jnp.where(fill, jnp.uint8(FOREGROUND_VALUE), masks)

    # --- binarize + open + area filter ------------------------------------
    fg = morphology.open_(masks == FOREGROUND_VALUE, MORPH_KERNEL_SIZE)
    lbl2 = cc_label_pallas(fg, interpret=interpret)
    keep = _batch_predicate(lbl2, fg, min_area, "keep")
    return jnp.where(keep, jnp.uint8(FOREGROUND_VALUE), jnp.uint8(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def postprocess_batch_v4(masks: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Batched device postprocess v4 (scatter-free slot stats)."""
    squeeze = masks.ndim == 2
    if squeeze:
        masks = masks[None]
    out = _postprocess_masks_v4(masks, interpret=interpret)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("use_pallas_cc", "interpret"))
def postprocess_mask_jit(mask: jax.Array, use_pallas_cc: bool = False,
                         interpret: bool = False) -> jax.Array:
    return postprocess_mask(mask, use_pallas_cc, interpret)


@functools.partial(jax.jit, static_argnames=("use_pallas_cc", "interpret"))
def postprocess_batch(masks: jax.Array, use_pallas_cc: bool = False,
                      interpret: bool = False) -> jax.Array:
    """(N, H, W) uint8 -> (N, H, W) uint8, vmapped over the batch."""
    return jax.vmap(
        functools.partial(postprocess_mask, use_pallas_cc=use_pallas_cc,
                          interpret=interpret)
    )(masks)
