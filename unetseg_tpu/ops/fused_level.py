"""Fused UNet-level Pallas mega-kernels — the bandwidth levers.

Measured physics (benchmarks/exp_bw.py, exp_fold_ablate.py, this chip):
HBM streams at ~230-310 GB/s while in-kernel MXU dots sustain ~197 TF/s
marginal — the 512² UNet is **bandwidth-bound** (~22 GB of activations per
batch-32 ≈ 71 ms of the ~100 ms pipeline).  These kernels fuse whole UNet
levels so each activation byte crosses HBM once:

* ``dec1_head_fused``: upsample (2×2 transposed conv) + skip concat +
  conv3x3+ReLU + conv3x3+ReLU + 1x1 head + argmax — the entire 512² decoder
  level — reading dec2's output (0.5 GB) + the skip (1 GB) and writing the
  8 MB class mask.  Replaces ~8 GB of HBM round-trips.
* ``enc1_fused``: conv1-from-u8 is left to XLA (cheap); conv3x3+ReLU +
  2×2 maxpool fused, emitting the skip in the packed layout dec1 consumes
  plus the pooled tensor.

Layout algebra (zero XLA-side relayouts, zero gathers, 1.33× MAC fold
overhead bought back by full 128-lane MXU occupancy at C=64):

* **E layout**: (rows, W/2, 2C), folded col m = real cols (2m, 2m+1) — a
  contiguity-preserving reshape of NHWC.
* **L layout**: (rows, W/2+1, 2C), folded col t = real cols (2t-1, 2t) —
  E shifted by one column; boundary halves are zero (the conv SAME pad).
* A 3x3 conv between the two layouts always reads TWO adjacent folded
  columns per output column (window cols 2t-2..2t+1 or 2m-1..2m+2), so each
  tap row is two MXU dots with K = 2C over *pure slices*:
  L→E: A_lo = L[m], A_hi = L[m+1]; E→L: A_lo = E[t-1], A_hi = E[t].
  Both use the same folded weights W2[dy, (o, c), (dxout, d)] with
  o = dxout+dx (ops/fold_conv.fold2_weights).
* The upsampler is a single GEMM per output-row parity a with
  N = (bb, d): its natural output minor order IS the E layout.

Reference analog: the whole-net TensorRT launch, /root/reference/
src/process.cpp:99-105,147 — here each launch is one Pallas program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unetseg_tpu.ops.fold_conv import fold2_weights

try:  # pragma: no cover
    _Element = pl.Element  # type: ignore[attr-defined]
except AttributeError:  # pragma: no cover
    from jax._src.pallas.core import Element as _Element


# ---------------------------------------------------------------------------
# dec1 mega-kernel
# ---------------------------------------------------------------------------

def _prep_dec1_weights(wu, bu, w1, b1, w2, b2, wh, bh, dtype):
    """XLA-side weight folding for the dec1 kernel (tiny, cached by jit)."""
    C = w2.shape[2]           # 64
    C2 = 2 * C
    # up: out[2y+a, 2x+bb, d] = sum_c z[y,x,c] * wu[1-a, 1-bb, c, d]
    wu_t = []
    for a in range(2):
        m = jnp.stack([wu[1 - a, 1 - bb] for bb in range(2)], axis=1)
        wu_t.append(m.reshape(C2, C2))  # (c, (bb, d))
    wu_k = jnp.stack(wu_t).astype(dtype)

    # conv1: Cin=128 = concat(skip 0:64, up 64:128); fold per source
    w1s = fold2_weights(w1[:, :, :C, :], dtype)   # (3, 4C, 2D)
    w1u = fold2_weights(w1[:, :, C:, :], dtype)
    w1lo = jnp.stack([w1s[:, :C2, :], w1u[:, :C2, :]])   # (2, 3, C2, C2)
    w1hi = jnp.stack([w1s[:, C2:, :], w1u[:, C2:, :]])
    b1f = jnp.tile(b1, 2).reshape(1, 1, C2).astype(dtype)

    w2f = fold2_weights(w2, dtype)
    w2lo, w2hi = w2f[:, :C2, :], w2f[:, C2:, :]
    b2f = jnp.tile(b2, 2).reshape(1, C2).astype(dtype)

    # head: (px, d) -> (c, px); bias folded in via the logits' linearity:
    # logits = c2 @ Wh + bh — bh is per-class, added by baking it into an
    # extra comparison-free constant: we add it to the dot by augmenting...
    # simplest: argmax(l + bh) == argmax over shifted logits; fold bh into
    # the comparison by adding after the dot (bh broadcast per (c, px)).
    whm = jnp.zeros((C2, 8), jnp.float32)
    for px in range(2):
        for c in range(3):
            whm = whm.at[px * C:(px + 1) * C, 2 * c + px].set(
                wh.reshape(C, 3)[:, c])
    bhm = jnp.zeros((8,), jnp.float32)
    for px in range(2):
        for c in range(3):
            bhm = bhm.at[2 * c + px].set(bh[c])
    return wu_k, w1lo, w1hi, b1f, w2lo, w2hi, b2f, whm.astype(dtype), bhm


@functools.partial(jax.jit, static_argnames=("tr", "interpret"))
def dec1_head_fused(z_pad: jax.Array, skip_pe: jax.Array,
                    wu, bu, w1, b1, w2, b2, wh, bh, *,
                    tr: int = 8, interpret: bool = False) -> jax.Array:
    """Fused 512² decoder level + head + argmax.

    Args:
      z_pad:   (B, Hz+2, Wz+2, 2C) — dec2 output, zero-padded by 1 (natural).
      skip_pe: (B, H+4, W/2+2, 2C) — skip in padded-E layout: rows 2..H+1 are
               image rows, folded cols 1..W/2 are image columns, borders zero.
      weights: unfolded NHWC/HWIO params of up/conv1/conv2/head.
    Returns:
      (B, H, W) uint8 class mask.
    """
    B, Hz2, Wz2, C2 = z_pad.shape
    Hz, Wz = Hz2 - 2, Wz2 - 2
    H, W2 = 2 * Hz, Wz          # output rows; folded output cols
    assert skip_pe.shape == (B, H + 4, W2 + 2, C2), skip_pe.shape

    TR = tr
    n_h = H // TR
    assert H % TR == 0 and TR % 2 == 0

    dtype = z_pad.dtype
    wu_k, w1lo, w1hi, b1f, w2lo, w2hi, b2f, whm, bhm = _prep_dec1_weights(
        wu, bu, w1, b1, w2, b2, wh, bh, dtype)
    # The upsampler bias can't fold into b1 (SAME-pad windows at the image
    # edge see fewer up taps), so the kernel adds it to the up planes BEFORE
    # the validity mask zeroes the out-of-image positions.
    b_up = jnp.tile(bu, 2).reshape(1, 1, C2).astype(jnp.float32)

    kernel = functools.partial(
        _dec1_full_kernel, TR=TR, W2=W2, C2=C2, n_h=n_h, relu_dtype=dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B * n_h,),
        in_specs=[
            pl.BlockSpec(
                (_Element(1), _Element(TR // 2 + 2), _Element(W2 + 2),
                 _Element(C2)),
                lambda i: (i // n_h, (i % n_h) * (TR // 2), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_Element(1), _Element(TR + 4), _Element(W2 + 2),
                 _Element(C2)),
                lambda i: (i // n_h, (i % n_h) * TR, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C2, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3, C2, C2), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3, C2, C2), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C2, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C2, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, TR * W2, 8), lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_h, TR * W2, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(z_pad, skip_pe, wu_k, b_up, w1lo, w1hi, b1f, w2lo, w2hi, b2f,
      whm, bhm.reshape(1, 8).astype(jnp.float32))
    # (B, n_h, TR·W2, 8) f32 class slabs -> (B, H, W) u8 (XLA, 16 MB)
    cls = out[..., :2].astype(jnp.uint8)
    return cls.reshape(B, H, W2 * 2)


def _dec1_full_kernel(z_ref, skip_ref, wu_ref, bu_ref, w1lo_ref, w1hi_ref,
                      b1_ref, w2lo_ref, w2hi_ref, b2_ref, wh_ref, bh_ref,
                      out_ref, *, TR, W2, C2, n_h, relu_dtype):
    h = pl.program_id(0) % n_h
    r0 = h * TR
    WF = W2 + 2
    Mz = (TR // 2 + 2) * WF
    H = TR * n_h

    # upsample GEMMs -> parity planes, interleaved into one contiguous
    # row buffer: up_full row r' = abs up row r0-2+r' (padded-E cols).
    zs = z_ref[0].reshape(Mz, C2)
    planes = []
    for a in range(2):
        pa = lax.dot_general(zs, wu_ref[a], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        pa = pa.reshape(TR // 2 + 2, 1, WF, C2) + bu_ref[...]
        planes.append(pa)
    up = jnp.concatenate(planes, axis=1).reshape(TR + 4, WF, C2)
    row = lax.broadcasted_iota(jnp.int32, (TR + 4, WF, 1), 0)
    fc = lax.broadcasted_iota(jnp.int32, (TR + 4, WF, 1), 1)
    abs_row = r0 - 2 + row
    valid = (abs_row >= 0) & (abs_row < H) & (fc >= 1) & (fc <= W2)
    up = jnp.where(valid, up, 0.0).astype(relu_dtype)

    # conv1 (E -> L), two sources with identical window structure
    R1 = TR + 2
    M1 = R1 * (W2 + 1)
    acc1 = jnp.zeros((M1, C2), jnp.float32)
    for dy in range(3):
        for src, buf in ((0, None), (1, up)):
            rows = skip_ref[0, dy:dy + R1, :, :] if src == 0 \
                else buf[dy:dy + R1, :, :]
            a_lo = rows[:, 0:W2 + 1, :].reshape(M1, C2)
            a_hi = rows[:, 1:W2 + 2, :].reshape(M1, C2)
            acc1 += lax.dot_general(a_lo, w1lo_ref[src, dy],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc1 += lax.dot_general(a_hi, w1hi_ref[src, dy],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    c1 = jnp.maximum(acc1.reshape(R1, W2 + 1, C2)
                     + b1_ref[...].astype(jnp.float32), 0.0)
    fc = lax.broadcasted_iota(jnp.int32, (R1, W2 + 1, C2), 1)
    ch = lax.broadcasted_iota(jnp.int32, (R1, W2 + 1, C2), 2)
    row = lax.broadcasted_iota(jnp.int32, (R1, W2 + 1, C2), 0)
    abs_r = r0 - 1 + row
    keep = ((fc > 0) | (ch >= C2 // 2)) & ((fc < W2) | (ch < C2 // 2)) \
        & (abs_r >= 0) & (abs_r < H)
    c1 = jnp.where(keep, c1, 0.0).astype(relu_dtype)

    # conv2 (L -> E)
    M2 = TR * W2
    acc2 = jnp.zeros((M2, C2), jnp.float32)
    for dy in range(3):
        c1r = c1[dy:dy + TR, :, :]
        a_lo = c1r[:, 0:W2, :].reshape(M2, C2)
        a_hi = c1r[:, 1:W2 + 1, :].reshape(M2, C2)
        acc2 += lax.dot_general(a_lo, w2lo_ref[dy], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc2 += lax.dot_general(a_hi, w2hi_ref[dy], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    c2 = jnp.maximum(acc2 + b2_ref[...].astype(jnp.float32), 0.0)
    c2 = c2.astype(relu_dtype)

    # head + argmax (first-max tie-break, reference CMP_GT semantics).
    # Mosaic can't shape-cast the (M2, 2) pixel-pair minor into the output
    # lane dim, so the kernel emits float32 class ids in an (M2, 8) slab and
    # XLA does the cheap cast + unfold (16 MB).
    lg = lax.dot_general(c2, wh_ref[...], (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32) + bh_ref[...]
    l0, l1, l2 = lg[:, 0:2], lg[:, 2:4], lg[:, 4:6]
    best01 = jnp.where(l1 > l0, 1.0, 0.0)
    cls = jnp.where(l2 > jnp.maximum(l0, l1), 2.0, best01)   # (M2, 2) f32
    out_ref[...] = jnp.concatenate(
        [cls, jnp.zeros((M2, 6), jnp.float32)], axis=1)


def skip_to_padded_e(skip: jax.Array) -> jax.Array:
    """(B, H, W, C) natural -> (B, H+4, W/2+2, 2C) padded-E (test helper;
    the production enc1 kernel writes this layout directly)."""
    B, H, W, C = skip.shape
    e = skip.reshape(B, H, W // 2, 2 * C)
    return jnp.pad(e, ((0, 0), (2, 2), (1, 1), (0, 0)))


# ---------------------------------------------------------------------------
# enc1 fused kernel: conv2 (L->E) + skip emission + 2x2 maxpool
# ---------------------------------------------------------------------------

def _enc1_kernel(c1_ref, w2lo_ref, w2hi_ref, b2_ref, skip_ref, pool_ref,
                 *, TR, W2, C2, H, ncells, relu_dtype):
    """Cell j computes conv2 for image rows [TR*j-2, TR*j+TR-2), writes the
    skip block (padded-E rows [TR*j, TR*j+TR)) and pooled rows
    [TR/2*j, ...+TR/2) of the 1-row-padded pooled buffer.

    c1_ref: (1, TR+2, W2+1, C2) — conv1 output in L layout, H-padded by 3
            (buffer row = conv1 row + 3), Element window at offset TR*j.
    """
    jj = pl.program_id(0) % ncells
    r_img0 = TR * jj - 2  # first image row this cell computes

    M2 = TR * W2
    acc = jnp.zeros((M2, C2), jnp.float32)
    for dy in range(3):
        c1r = c1_ref[0, dy:dy + TR, :, :]
        a_lo = c1r[:, 0:W2, :].reshape(M2, C2)
        a_hi = c1r[:, 1:W2 + 1, :].reshape(M2, C2)
        acc += lax.dot_general(a_lo, w2lo_ref[dy], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        acc += lax.dot_general(a_hi, w2hi_ref[dy], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    c2 = jnp.maximum(acc.reshape(TR, W2, C2) + b2_ref[...].astype(jnp.float32),
                     0.0)
    row = lax.broadcasted_iota(jnp.int32, (TR, W2, C2), 0)
    abs_r = r_img0 + row
    c2 = jnp.where((abs_r >= 0) & (abs_r < H), c2, 0.0).astype(relu_dtype)

    # skip block: zero fc on each side -> (TR, W2+2, C2)
    zfc = jnp.zeros((TR, 1, C2), relu_dtype)
    skip_ref[...] = jnp.concatenate([zfc, c2, zfc], axis=1)

    # 2x2 maxpool: row pairs are aligned (r_img0 even); parts are lanes.
    # (strided row slicing doesn't lower in Mosaic; reshape the untiled dim)
    c2p = c2.reshape(TR // 2, 2, W2, C2)
    pr = jnp.maximum(c2p[:, 0], c2p[:, 1])        # (TR/2, W2, C2)
    pool = jnp.maximum(pr[:, :, :C2 // 2], pr[:, :, C2 // 2:])
    prow = lax.broadcasted_iota(jnp.int32, pool.shape, 0)
    abs_p = (r_img0 // 2) + prow
    pool = jnp.where((abs_p >= 0) & (abs_p < H // 2), pool,
                     jnp.asarray(0, pool.dtype))
    pool_ref[...] = pool.astype(relu_dtype)


@functools.partial(jax.jit, static_argnames=("tr", "interpret"))
def enc1_fused(c1_lpad: jax.Array, w2, b2, *, tr: int = 12,
               interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """conv2 (3x3+ReLU) + skip emission + 2x2 maxpool, fused.

    Args:
      c1_lpad: (B, H+6, W/2+1, 2C) — conv1 output in L layout, H-padded by 3
               top / 3 bottom (zeros), produced by conv1_l_from_u8.
      w2, b2:  unfolded (3,3,C,C) / (C,) conv2 params.
    Returns:
      skip_pe: (B, H+4, W/2+2, 2C) padded-E skip (dec1_head_fused's input).
      pooled_pad: (B, H/2+2, W/2, C) pooled, 1 zero row top/bottom — feed the
               next conv with padding ((0,0),(1,1)) in H.
    """
    B, Hp, WF, C2 = c1_lpad.shape
    H = Hp - 6
    W2 = WF - 1
    C = C2 // 2
    TR = tr
    ncells = (H + 4) // TR
    assert ncells * TR == H + 4, (H, TR)
    assert TR % 2 == 0

    dtype = c1_lpad.dtype
    w2f = fold2_weights(w2, dtype)
    w2lo, w2hi = w2f[:, :C2, :], w2f[:, C2:, :]
    b2f = jnp.tile(b2, 2).reshape(1, C2).astype(dtype)

    kernel = functools.partial(
        _enc1_kernel, TR=TR, W2=W2, C2=C2, H=H, ncells=ncells,
        relu_dtype=dtype)

    skip_pe, pooled_pad = pl.pallas_call(
        kernel,
        grid=(B * ncells,),
        in_specs=[
            pl.BlockSpec(
                (_Element(1), _Element(TR + 2), _Element(WF), _Element(C2)),
                lambda i: (i // ncells, (i % ncells) * TR, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C2, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C2, C2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (None, TR, W2 + 2, C2),
                lambda i: (i // ncells, i % ncells, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, TR // 2, W2, C),
                lambda i: (i // ncells, i % ncells, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H + 4, W2 + 2, C2), dtype),
            jax.ShapeDtypeStruct((B, (H + 4) // 2, W2, C), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(c1_lpad, w2lo, w2hi, b2f)
    return skip_pe, pooled_pad


def conv1_l_from_u8(u8: jax.Array, w1, b1, dtype=jnp.bfloat16) -> jax.Array:
    """u8 normalize + conv1 (Cin=1) as one XLA stride-2 conv emitting the L
    layout directly: (B, H, W) uint8 -> (B, H+6, W/2+1, 2C) with boundary
    columns/rows zeroed (the SAME pad conv2's windows expect).

    /255 is folded into the weights (the reference normalizes u8 to [0,1],
    src/process.cpp:128-136).
    """
    B, H, W = u8.shape
    C = w1.shape[-1]
    x = u8.astype(dtype)[..., None]
    # L output fc t = cols (2t-1, 2t), window padded cols [2t, 2t+3] with a
    # 2-left/2-right pad; rows: conv1 out rows -1..H (H+2) need 1+1 row pad.
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    w2e = fold2_weights(w1.astype(dtype) / 255.0, dtype).reshape(3, 4, 1, 2 * C)
    y = lax.conv_general_dilated(
        xp, w2e, (1, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y + jnp.tile(b1.astype(dtype), 2))
    # zero the L boundary halves (col -1 / col W) and out-of-image rows
    W2 = W // 2
    fc = lax.broadcasted_iota(jnp.int32, (1, H + 2, W2 + 1, 2 * C), 2)
    ch = lax.broadcasted_iota(jnp.int32, (1, H + 2, W2 + 1, 2 * C), 3)
    row = lax.broadcasted_iota(jnp.int32, (1, H + 2, W2 + 1, 2 * C), 1)
    keep = ((fc > 0) | (ch >= C)) & ((fc < W2) | (ch < C)) \
        & (row >= 1) & (row < H + 1)
    y = jnp.where(keep, y, jnp.asarray(0, dtype))
    # H-pad to +3/+3 (kernel window convenience: buffer row = image row + 3)
    return jnp.pad(y, ((0, 0), (2, 2), (0, 0), (0, 0)))
