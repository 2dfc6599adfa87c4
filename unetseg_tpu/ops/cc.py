"""Connected components with stats, on-device (pure XLA).

The reference leans on ``cv::connectedComponentsWithStats`` (8-connectivity)
twice per image (``/root/reference/src/postprocess.cpp:26,64``) — a serial
union-find on the host.  The TPU-native equivalent is a parallel
label-propagation CCL in the Shiloach–Vishkin style:

1. every foreground pixel starts labeled with its own flat index
   (background pixels carry the sentinel ``H*W``),
2. **hook**: each pixel computes the min label over its 8 foreground
   neighbors and scatter-mins that value into its current root,
3. **compress**: pointer-jumping (``lbl = lbl[lbl]``, log2(H*W) times)
   flattens every chain to its root,
4. repeat under ``lax.while_loop`` until a fixed point.

Each iteration is a handful of 1 MiB gathers/scatters — microseconds on a
v5e — and converges in O(log) iterations even for snake/spiral shapes thanks
to the scatter-min hooking.  Only per-component *stats* are consumed
downstream (area, bbox), so label numbering need not match OpenCV's raster
order; equivalence is established per-pixel via the root labels.

Stats come from segment reductions over the root labels: area =
``segment_sum(1)``, bbox = segment min/max of row/col indices — each a single
scatter pass, no host round-trip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class CCStats(NamedTuple):
    """Per-segment stats indexed by root label (length H*W + 1).

    Entry ``H*W`` is the background sentinel.  Non-root labels have
    area == 0 and inverted bboxes.
    """

    area: jax.Array  # int32 (L+1,)
    min_row: jax.Array
    min_col: jax.Array
    max_row: jax.Array
    max_col: jax.Array


def _neighbor_min8(lbl: jax.Array, fg: jax.Array, sentinel: int) -> jax.Array:
    """Min label over the 8-neighborhood, considering only fg neighbors."""
    masked = jnp.where(fg, lbl, sentinel)
    p = jnp.pad(masked, 1, constant_values=sentinel)
    h, w = lbl.shape
    m = lbl
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.minimum(m, lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w)))
    return m


def cc_label(fg: jax.Array, max_iters: int = 64) -> jax.Array:
    """Label 8-connected components of a (H, W) boolean mask.

    Returns int32 (H, W): foreground pixels get their component's root flat
    index; background pixels get the sentinel ``H*W``.  ``max_iters`` bounds
    the hook/compress relaxation (each round at least halves the number of
    distinct non-root trees, so 64 covers any mask up to 2^64 pixels; the
    loop exits early once labels are stable).
    """
    h, w = fg.shape
    size = h * w
    sentinel = jnp.int32(size)
    idx = lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + lax.broadcasted_iota(
        jnp.int32, (h, w), 1
    )
    lbl0 = jnp.where(fg, idx, sentinel)

    n_jumps = max(1, (size - 1).bit_length())

    def compress(f):
        # Pointer jumping with a sentinel slot appended so bg self-resolves.
        def jump(_, f):
            fpad = jnp.concatenate([f, jnp.array([size], jnp.int32)])
            return fpad[f]

        return lax.fori_loop(0, n_jumps, jump, f)

    def body(state):
        lbl, _, i = state
        m = _neighbor_min8(lbl, fg, size)
        m = jnp.where(fg, jnp.minimum(lbl, m), sentinel)
        # Hook: root(p) <- min(root(p), m(p)); scatter-min on the flat array.
        flat = jnp.concatenate([lbl.reshape(-1), jnp.array([size], jnp.int32)])
        flat = flat.at[lbl.reshape(-1)].min(m.reshape(-1))
        f = compress(flat[:-1])
        new = f.reshape(h, w)
        return new, jnp.any(new != lbl), i + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    lbl, _, _ = lax.while_loop(cond, body, (lbl0, jnp.bool_(True), jnp.int32(0)))
    return lbl


def cc_stats(fg: jax.Array, lbl: jax.Array) -> CCStats:
    """Segment-reduced area/bbox per root label (OpenCV CC_STAT_* analog)."""
    h, w = fg.shape
    size = h * w
    flat_lbl = lbl.reshape(-1)
    ones = fg.reshape(-1).astype(jnp.int32)
    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)

    area = jnp.zeros((size + 1,), jnp.int32).at[flat_lbl].add(ones)
    big = jnp.int32(size)
    fg_flat = fg.reshape(-1)
    min_row = jnp.full((size + 1,), big, jnp.int32).at[flat_lbl].min(
        jnp.where(fg_flat, rows, big)
    )
    min_col = jnp.full((size + 1,), big, jnp.int32).at[flat_lbl].min(
        jnp.where(fg_flat, cols, big)
    )
    max_row = jnp.full((size + 1,), -1, jnp.int32).at[flat_lbl].max(
        jnp.where(fg_flat, rows, -1)
    )
    max_col = jnp.full((size + 1,), -1, jnp.int32).at[flat_lbl].max(
        jnp.where(fg_flat, cols, -1)
    )
    return CCStats(area, min_row, min_col, max_row, max_col)


def connected_components_with_stats(fg: jax.Array):
    """Convenience wrapper: labels + stats for a (H, W) bool mask."""
    lbl = cc_label(fg)
    return lbl, cc_stats(fg, lbl)

def cc_area(fg: jax.Array, lbl: jax.Array) -> jax.Array:
    """Per-root areas only (one scatter-add) — for consumers that don't need
    bboxes (the postprocess area filter), ~5x cheaper than full cc_stats."""
    h, w = fg.shape
    size = h * w
    return jnp.zeros((size + 1,), jnp.int32).at[lbl.reshape(-1)].add(
        fg.reshape(-1).astype(jnp.int32))
