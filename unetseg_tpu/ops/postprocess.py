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


def fill_holes_inside_foreground(mask: jax.Array) -> jax.Array:
    """(H, W) uint8 label mask -> mask with interior holes set to 2.

    Always uses the XLA CCL (this is the readable oracle path; the device
    fast path is :func:`_postprocess_masks_v4`, which has its own Pallas
    labeling — the old per-stage ``use_pallas_cc`` plumbing here was an
    unreachable third hybrid and was removed)."""
    h, w = mask.shape
    min_area = min_area_threshold(h, w)
    fg = mask == FOREGROUND_VALUE
    inv = ~fg
    lbl, stats = cc.connected_components_with_stats(inv)
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

    ``use_pallas_cc`` routes to the device fast path (v4,
    :func:`_postprocess_masks_v4`: Pallas CCL + slot-compressed component
    stats, 1.4-1.7 ms/mask on a v5e chip); the XLA branch below is the
    readable oracle the fast path is tested against.
    """
    if use_pallas_cc:
        return _postprocess_masks_v4(mask[None], interpret=interpret)[0]

    h, w = mask.shape
    min_area = min_area_threshold(h, w)

    mask = fill_holes_inside_foreground(mask)

    fg = morphology.open_(mask == FOREGROUND_VALUE, MORPH_KERNEL_SIZE)

    lbl = cc.cc_label(fg)
    keep_seg = cc.cc_area(fg, lbl) >= min_area
    keep = keep_seg[lbl.reshape(-1)].reshape(h, w) & fg

    return jnp.where(keep, jnp.uint8(FOREGROUND_VALUE), jnp.uint8(0))


# Device postprocess v3 (ONE area scatter-add + min-propagation predicate
# floods, 6.7 ms/mask) was retired in round 4: v4 below measures 1.4-1.7
# ms/mask with identical semantics.  The generic min-flood primitive v3
# introduced (cc_pallas.propagate_min_pallas) remains available and tested.


# ---------------------------------------------------------------------------
# Device postprocess v4: slot-compressed component stats (VERDICT r3 item 6)
# ---------------------------------------------------------------------------

_K_SLOTS = 128


def _slot_roots(lbl: jax.Array, region: jax.Array):
    """Up to K component roots as a STATIC-size vector (padded -1).

    A component's root label is its minimum member flat index, so roots are
    exactly the pixels whose label equals their own index.  Extraction is
    ``lax.top_k`` on the masked score ``size - idx`` (1.15 ms/mask on the
    chip) — NOT ``jnp.nonzero(size=K)``, whose bounded-size lowering runs
    3.2 ms/mask (measured, round 4)."""
    h, w = lbl.shape
    size = h * w
    idx = jnp.arange(size, dtype=jnp.int32)
    is_root = region.reshape(-1) & (lbl.reshape(-1) == idx)
    n_roots = jnp.sum(is_root.astype(jnp.int32))
    score = jnp.where(is_root, size - idx, 0)
    top, _ = jax.lax.top_k(score, min(_K_SLOTS, size))  # tiny-image clamp
    roots = jnp.where(top > 0, size - top, -1)
    return roots, n_roots


def _region_predicate_fast(lbl: jax.Array, region: jax.Array,
                           roots: jax.Array,
                           min_area: int, mode: str) -> jax.Array:
    """Per-pixel component predicate without scatters, gathers or floods.

    v3 spent ~3.5 ms/mask on a 262k-update scatter-add (areas) plus ~1 ms
    min-propagation per predicate (exp_devpost_profile.py).  v4 compresses
    components into K=128 static slots (real masks have a handful) and
    evaluates areas / border-touch / the predicate as K-row compare-reduce
    sweeps — pure VPU streaming.  Caller guarantees <= K components
    (overflow routes to :func:`_region_predicate_exact` at batch level)
    and supplies the roots from its counting pass (one extraction, reused).
    """
    h, w = lbl.shape
    flat = lbl.reshape(-1)
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
    roots, n_roots = jax.vmap(_slot_roots)(lbl, region)
    fast = functools.partial(_region_predicate_fast, min_area=min_area,
                             mode=mode)

    def exact(args):
        l, r, _ = args
        return jax.vmap(functools.partial(
            _region_predicate_exact, min_area=min_area, mode=mode))(l, r)

    return jax.lax.cond(
        jnp.max(n_roots) <= _K_SLOTS,
        lambda args: jax.vmap(fast)(*args),
        exact,
        (lbl, region, roots),
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


def postprocess_masks(masks: jax.Array, use_pallas_cc: bool = False,
                      interpret: bool = False) -> jax.Array:
    """Batched cleanup, traceable inside a larger program.

    The fast path goes straight to :func:`_postprocess_masks_v4` — NEVER
    vmap ``postprocess_mask(use_pallas_cc=True)``: v4's exact-fallback
    cond sits at batch level, and vmap of a cond executes both branches.
    """
    if use_pallas_cc:
        return _postprocess_masks_v4(masks, interpret=interpret)
    return jax.vmap(postprocess_mask)(masks)


@functools.partial(jax.jit, static_argnames=("use_pallas_cc", "interpret"))
def postprocess_batch(masks: jax.Array, use_pallas_cc: bool = False,
                      interpret: bool = False) -> jax.Array:
    """(N, H, W) uint8 -> (N, H, W) uint8 (jitted entry)."""
    return postprocess_masks(masks, use_pallas_cc, interpret)
