"""Pallas connected-components labeling — device postprocess v2.

The XLA CCL (ops/cc.py) relaxes through HBM: every hook/compress iteration
is a round of 1 MiB gathers/scatters, ~hundreds of ms per 512² mask.  This
kernel keeps the whole label image in VMEM and converges with **segmented
log-scans**: one pass propagates the run-minimum across every maximal
foreground run of every row and column (Hillis–Steele doubling, log2(W)
steps), plus one 8-neighbor min step for diagonal-only links.  A pass is
~100 µs of pure VPU work; convex blobs converge in 2-3 passes and each
extra pass handles one more "turn" of the shape (an S needs 3, a spiral one
per winding).

Labels match ops/cc.cc_label's contract exactly: foreground pixels carry
their component's minimum flat index, background carries the sentinel H*W
(verified against the XLA oracle in tests/test_cc_pallas.py), so
cc.cc_stats and the postprocess predicates compose unchanged.

Replaces the relaxation loop of /root/reference/src/postprocess.cpp:26,64
(cv::connectedComponentsWithStats) for the all-device pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x: jax.Array, s: int, axis: int, fill) -> jax.Array:
    """Shift x by +s along axis (rows move down / cols move right),
    filling vacated cells — value semantics, Mosaic-friendly concat."""
    H, W = x.shape
    if axis == 0:
        pad = jnp.full((s, W), fill, x.dtype)
        return jnp.concatenate([pad, x[: H - s]], axis=0)
    pad = jnp.full((H, s), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : W - s]], axis=1)


def _unshift(x: jax.Array, s: int, axis: int, fill) -> jax.Array:
    """Shift by -s along axis."""
    H, W = x.shape
    if axis == 0:
        pad = jnp.full((s, W), fill, x.dtype)
        return jnp.concatenate([x[s:], pad], axis=0)
    pad = jnp.full((H, s), fill, x.dtype)
    return jnp.concatenate([x[:, s:], pad], axis=1)


def _scan_dir(val_ref, run_ref, axis: int, backward: bool, sentinel):
    """In-place segmented min-scan along axis (Hillis-Steele doubling).

    val/run live in scratch refs so every doubling step reuses the same
    VMEM buffers (value-SSA form blew the 16 MB scoped limit at 512²).
    """
    n = val_ref.shape[axis]
    sh = _unshift if backward else _shift
    s = 1
    while s < n:
        val = val_ref[...]
        run = run_ref[...]
        vs = sh(val, s, axis, sentinel)
        rs = sh(run, s, axis, 0)
        val_ref[...] = jnp.where(run > 0, jnp.minimum(val, vs), val)
        run_ref[...] = run * rs
        s *= 2


def _neighbor_min8(lbl, fgi, sentinel):
    m = lbl
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            v = lbl
            if dy:
                v = _shift(v, dy, 0, sentinel) if dy > 0 else \
                    _unshift(v, -dy, 0, sentinel)
            if dx:
                v = _shift(v, dx, 1, sentinel) if dx > 0 else \
                    _unshift(v, -dx, 1, sentinel)
            m = jnp.minimum(m, v)
    return jnp.where(fgi > 0, jnp.minimum(lbl, m), lbl)


def _cc_kernel(lbl_ref, out_ref, lbl_s, val_s, run_s, *, H, W, max_passes,
               sentinel):
    sentinel = jnp.int32(sentinel)
    lbl_s[...] = lbl_ref[0]
    fgi0 = jnp.where(lbl_ref[0] != sentinel, jnp.int32(1), jnp.int32(0))

    def seg_scan(axis):
        # min over both directions of each maximal fg run along axis
        val_s[...] = lbl_s[...]
        run_s[...] = fgi0
        _scan_dir(val_s, run_s, axis, False, sentinel)
        fwd = val_s[...]
        val_s[...] = lbl_s[...]
        run_s[...] = fgi0
        _scan_dir(val_s, run_s, axis, True, sentinel)
        lbl_s[...] = jnp.minimum(fwd, val_s[...])

    def body(state):
        _, i = state
        prev = lbl_s[...]
        seg_scan(1)                                    # rows (lanes)
        seg_scan(0)                                    # cols (sublanes)
        lbl_s[...] = _neighbor_min8(lbl_s[...], fgi0, sentinel)
        return jnp.any(lbl_s[...] != prev), i + 1

    def cond(state):
        changed, i = state
        return changed & (i < max_passes)

    lax.while_loop(cond, body, (jnp.bool_(True), jnp.int32(0)))
    out_ref[0] = lbl_s[...]


def _propagate_min(init: jax.Array, *, sentinel: int, max_passes: int,
                   interpret: bool) -> jax.Array:
    """Run the segmented min-propagation kernel on arbitrary int32 seeds.

    ``init``: (B, H, W) int32; cells equal to ``sentinel`` are background
    (propagation never crosses them), every other cell carries a seed value.
    Each 8-connected region of non-sentinel cells converges to its minimum
    seed.  CC labeling is the special case seed = flat index; value
    broadcast from a component's root is the case seed = root*2 + bit
    (see ops/postprocess.py fast path).
    """
    B, H, W = init.shape
    kernel = functools.partial(_cc_kernel, H=H, W=W, max_passes=max_passes,
                               sentinel=sentinel)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.int32),   # labels
            pltpu.VMEM((H, W), jnp.int32),   # scan value
            pltpu.VMEM((H, W), jnp.int32),   # scan run
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(init)


@functools.partial(jax.jit, static_argnames=("max_passes", "interpret",
                                             "sentinel"))
def propagate_min_pallas(init: jax.Array, *, sentinel: int,
                         max_passes: int | None = None,
                         interpret: bool = False) -> jax.Array:
    """(H, W) or (B, H, W) int32 seeds -> per-region minima (see above)."""
    squeeze = init.ndim == 2
    if squeeze:
        init = init[None]
    _, H, W = init.shape
    if max_passes is None:
        max_passes = H + W
    out = _propagate_min(init, sentinel=sentinel, max_passes=max_passes,
                         interpret=interpret)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("max_passes", "interpret"))
def cc_label_pallas(fg: jax.Array, *, max_passes: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """(H, W) or (B, H, W) bool -> int32 root labels (cc.cc_label contract).

    ``max_passes`` bounds convergence for pathological shapes; each pass
    resolves one geodesic "turn", so the worst realizable case (a 1-px
    boustrophedon serpentine / spiral) needs on the order of H or W passes.
    The default ``H + W`` covers that with margin; typical organ masks
    converge in 2-4 passes and the while_loop exits on stability, so the
    bound costs nothing in the common case.
    """
    squeeze = fg.ndim == 2
    if squeeze:
        fg = fg[None]
    B, H, W = fg.shape
    if max_passes is None:
        max_passes = H + W
    sentinel = H * W
    idx = (lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + lax.broadcasted_iota(jnp.int32, (H, W), 1))
    lbl0 = jnp.where(fg, idx[None], jnp.int32(sentinel))
    out = _propagate_min(lbl0, sentinel=sentinel, max_passes=max_passes,
                         interpret=interpret)
    return out[0] if squeeze else out
