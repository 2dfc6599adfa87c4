"""Pallas fold2 3x3 conv — the 64-channel-level hot kernel.

The UNet's 512² levels carry 64 channels: a plain conv GEMM has N = 64 and
half the MXU's 128 output lanes idle, which is why XLA sustains only ~27-50
TF/s there while the ≥128-channel levels reach ~100 (docs/PERFORMANCE.md).

This kernel computes TWO adjacent output columns per GEMM row, so
N = 2·D = 128 lanes are full.  The trick that makes it free of gathers:

* pad W by 1 on each side (W+2 = 514) and *view* the array as
  (H+2, (W+2)/2, 2C) — a contiguity-preserving reshape;
* an output column-pair x2 (real cols 2·x2, 2·x2+1) needs padded cols
  [2·x2 .. 2·x2+3], which is exactly folded columns x2 and x2+1 — so the
  im2col windows are just the block and its shift-by-one: 2 dots per tap row
  (K = 2C each), 6 dots total, all operands VMEM-resident;
* weights are pre-folded (XLA, once per call) into W2[dy, dxx, c, dxout·D+d]
  with the dxout=1 copy shifted one column — 12 taps instead of 9, a 1.33×
  MAC overhead bought back threefold by full lane occupancy.

The folded output (B, H, W/2, 2D) reshapes back to (B, H, W, D) contiguously.
Accumulation is float32 in VMEM across all 6 dots; bias + ReLU fuse into the
epilogue.  Retired research path: no longer dispatched from models/unet.py
(the shipped students' geometries keep the MXU lanes full without folding —
see docs/PERFORMANCE.md for the measurements behind the demotion); kept as
the exemplar of the column-folding technique with its tests.

Replaces the reference's TensorRT conv launches (/root/reference/
src/process.cpp:147) on the shapes TensorRT would have auto-tuned.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # pragma: no cover
    _Element = pl.Element  # type: ignore[attr-defined]
except AttributeError:  # pragma: no cover
    from jax._src.pallas.core import Element as _Element


def fold2_weights(w: jax.Array, dtype=None) -> jax.Array:
    """(3, 3, C, D) -> (3, 4C, 2D): the two-column stride-2 fold.

    Output col pair (dxout=0, 1) reads padded cols dxx 0..2 / 1..3.
    """
    kh, kw, C, D = w.shape
    assert (kh, kw) == (3, 3), w.shape
    if dtype is not None:
        w = w.astype(dtype)
    w2 = jnp.zeros((3, 4, C, 2 * D), w.dtype)
    w2 = w2.at[:, 0:3, :, :D].set(w)
    w2 = w2.at[:, 1:4, :, D:].set(w)
    return w2.reshape(3, 4 * C, 2 * D)


def _kernel(x_ref, wlo_ref, whi_ref, b_ref, out_ref, *,
            TH, W2, K, ND, relu):
    # x_ref block: (1, TH+2, W2+1, K) — rows overlap (Element), K = 2C lanes.
    a = jnp.zeros((TH * W2, ND), jnp.float32)
    for dy in range(3):
        lo = x_ref[0, dy:dy + TH, 0:W2, :].reshape(TH * W2, K)
        hi = x_ref[0, dy:dy + TH, 1:W2 + 1, :].reshape(TH * W2, K)
        a += lax.dot_general(lo, wlo_ref[dy], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        a += lax.dot_general(hi, whi_ref[dy], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    r = a.reshape(TH, W2, ND) + b_ref[...].astype(jnp.float32)
    if relu:
        r = jnp.maximum(r, 0.0)
    out_ref[...] = r.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "th", "interpret"))
def conv3x3_fold2(x: jax.Array, w: jax.Array, b: jax.Array, *,
                  relu: bool = True,
                  th: Optional[int] = None,
                  interpret: bool = False) -> jax.Array:
    """3x3 stride-1 SAME conv + bias (+ReLU), NHWC x HWIO -> NHWC.

    Requires W even and 2·C, 2·D multiples of the lane width is NOT needed —
    C, D >= 8 suffices for Mosaic, but the kernel is profitable when
    D < 128 <= 2·D and 2·C >= 128.  float32 accumulate; output dtype = x's.
    """
    B, H, W, C = x.shape
    kh, kw, C2, D = w.shape
    assert (kh, kw) == (3, 3) and C2 == C, (w.shape, x.shape)
    assert W % 2 == 0, "fold2 needs even width"
    W2 = W // 2
    K = 2 * C
    ND = 2 * D

    TH = th or next((t for t in (16, 8, 32, 4, 2, 1) if H % t == 0), 1)
    n_h = H // TH

    # pad + fold view: padded width W+2 is even, so (B, H+2, W2+1, 2C) is a
    # contiguity-preserving reshape.  Output pair x2 reads padded cols
    # [2·x2 .. 2·x2+3] = folded cols x2, x2+1 (max used: 2·(W2-1)+3 = W+1 ✓).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xf = xp.reshape(B, H + 2, W2 + 1, K)

    w2 = fold2_weights(w, dtype=x.dtype)          # (3, 4C, 2D)
    wlo = w2[:, :K, :]                            # (3, 2C, 2D)
    whi = w2[:, K:, :]
    b2 = jnp.tile(b.astype(x.dtype), 2).reshape(1, 1, ND)

    kernel = functools.partial(
        _kernel, TH=TH, W2=W2, K=K, ND=ND, relu=relu
    )
    out = pl.pallas_call(
        kernel,
        grid=(B * n_h,),
        in_specs=[
            pl.BlockSpec(
                (_Element(1), _Element(TH + 2), _Element(W2 + 1), _Element(K)),
                lambda i: (i // n_h, (i % n_h) * TH, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, K, ND), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, ND), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ND), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TH, W2, ND),
            lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W2, ND), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xf, wlo, whi, b2)
    return out.reshape(B, H, W, D)
