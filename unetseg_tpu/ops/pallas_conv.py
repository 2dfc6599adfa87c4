"""Pallas 3x3 SAME convolution for TPU — the framework's hot-op kernel.

XLA's conv lowering sustains ~100 TFLOP/s on the UNet's shapes (measured on
v5e) while plain MXU GEMMs reach ~157: the gap is per-tap accumulator and
im2col traffic.  This kernel keeps a float32 accumulator in VMEM across all
9 kernel taps and all input-channel steps — each grid cell runs 9 MXU
matmuls per input-channel step with zero intermediate HBM traffic — and fuses
bias + ReLU into the epilogue.

Structure:
  * input pre-padded by 1px in H/W (one cheap XLA pad per call), so every
    window is interior;
  * grid (B * H/TH, D/TD, C/KC), last axis ``arbitrary`` (sequential) so the
    accumulator carries across input-channel steps;
  * the input row-band block uses an **Element** (element-indexed) block
    dimension — consecutive row tiles overlap by the 2-row halo, which
    Blocked tiling cannot express; Pallas pipelines the overlapping copies
    HBM->VMEM automatically;
  * taps are static sub-slices of the VMEM band, so the 9 matmuls read VMEM
    only.

Used by models/unet.py when ``ModelConfig.conv_impl == "experimental_pallas"`` (a measured-slower (in-model)
production path); the XLA conv remains the portable default and the
correctness oracle (tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Element-indexed block dimension: public in newer JAX as pl.Element; in
# jax 0.9 it lives in the core module.
try:  # pragma: no cover
    _Element = pl.Element  # type: ignore[attr-defined]
except AttributeError:  # pragma: no cover
    from jax._src.pallas.core import Element as _Element


def _pick(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return total


def _kernel(x_ref, w_ref, b_ref, out_ref, acc, *, TH, W, KC, TD, n_k, relu):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    a = acc[...]
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy:dy + TH, dx:dx + W, :]  # (TH, W, KC) from VMEM
            a += lax.dot_general(
                xs.reshape(TH * W, KC),
                w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(TH, W, TD)
    acc[...] = a

    @pl.when(k == n_k - 1)
    def _():
        r = acc[...] + b_ref[...].astype(jnp.float32)
        if relu:
            r = jnp.maximum(r, 0.0)
        out_ref[...] = r.astype(out_ref.dtype)


def _kernel_small_c(x_ref, w_ref, b_ref, out_ref, acc, *, TH, W, K, TD, relu):
    """Small-C variant: the 3 dx taps are pre-folded into the contraction dim
    (K = 3C), so each cell is 3 dy-dots with K >= 128 — Mosaic's Element
    blocks require the minor dimension to span full lanes, which C = 64
    alone cannot."""
    a = jnp.zeros_like(acc)
    for dy in range(3):
        xs = x_ref[0, dy:dy + TH, :, :]  # (TH, W, 3C)
        a += lax.dot_general(
            xs.reshape(TH * W, K),
            w_ref[dy],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TH, W, TD)
    r = a + b_ref[...].astype(jnp.float32)
    if relu:
        r = jnp.maximum(r, 0.0)
    out_ref[...] = r.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "th", "interpret"))
def _conv3x3_small_c(x: jax.Array, w: jax.Array, b: jax.Array, *,
                     relu: bool = True,
                     th: Optional[int] = None,
                     interpret: bool = False) -> jax.Array:
    B, H, W, C = x.shape
    _, _, _, D = w.shape
    TH = th or _pick(H, (8, 16, 4, 32, 2))
    n_h = H // TH
    K = 3 * C

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # dx-fold: (B, H+2, W, 3C), channel order dx-major to match w.reshape.
    xcat = jnp.concatenate(
        [lax.slice(xp, (0, 0, dx, 0), (B, H + 2, dx + W, C)) for dx in range(3)],
        axis=-1,
    )
    wcat = w.reshape(3, 3 * C, D)  # (dy, dx*C, D)
    b2 = b.reshape(1, D)

    kernel = functools.partial(
        _kernel_small_c, TH=TH, W=W, K=K, TD=D, relu=relu
    )
    return pl.pallas_call(
        kernel,
        grid=(B * n_h,),
        in_specs=[
            pl.BlockSpec(
                (_Element(1), _Element(TH + 2), _Element(W), _Element(K)),
                lambda i: (i // n_h, (i % n_h) * TH, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, K, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TH, W, D),
            lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((TH, W, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xcat, wcat, b2)


@functools.partial(
    jax.jit, static_argnames=("relu", "th", "kc", "td", "interpret")
)
def conv3x3_bias_act(x: jax.Array, w: jax.Array, b: jax.Array, *,
                     relu: bool = True,
                     th: Optional[int] = None,
                     kc: Optional[int] = None,
                     td: Optional[int] = None,
                     interpret: bool = False) -> jax.Array:
    """3x3 stride-1 SAME conv + bias (+ ReLU): NHWC x HWIO -> NHWC.

    Accumulation is float32; output dtype follows x.
    """
    B, H, W, C = x.shape
    kh, kw, C2, D = w.shape
    assert (kh, kw) == (3, 3) and C2 == C, (w.shape, x.shape)

    if C < 128:
        # Lane-deficient input channels: Mosaic's Element blocks need a
        # >=128 minor dim and the MXU K/N dims would run half-empty; the
        # dx-folded variant (_conv3x3_small_c) compiles but measures slower
        # than XLA's conv here, so small-C layers stay on the XLA path.
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        return jnp.maximum(out, 0) if relu else out

    TH = th or _pick(H, (16, 8, 4, 32, 2))
    KC = kc or _pick(C, (128, 256, 64, 512, 32, 16, 8, 4, 2, 1))
    TD = td or _pick(D, (128, 256, 64, 512, 32, 16, 8, 4, 2, 1))
    n_h, n_k, n_d = H // TH, C // KC, D // TD

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b2 = b.reshape(1, D)

    kernel = functools.partial(
        _kernel, TH=TH, W=W, KC=KC, TD=TD, n_k=n_k, relu=relu
    )

    return pl.pallas_call(
        kernel,
        grid=(B * n_h, n_d, n_k),
        in_specs=[
            # Mosaic requires all dims Element if any is: offsets are in
            # elements for every dimension here.
            pl.BlockSpec(
                (_Element(1), _Element(TH + 2), _Element(W + 2), _Element(KC)),
                lambda i, j, k: (i // n_h, (i % n_h) * TH, 0, k * KC),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, KC, TD), lambda i, j, k: (0, 0, k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TD), lambda i, j, k: (0, j), memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, TH, W, TD),
            lambda i, j, k: (i // n_h, i % n_h, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((TH, W, TD), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w, b2)
