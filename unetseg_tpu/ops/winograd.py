"""Winograd F(2x2, 3x3) convolution — the FLOP-reduction path to the perf
target.

A 3x3 stride-1 conv computed directly costs 9 MACs/output/channel-pair; the
Winograd F(2x2,3x3) transform computes each 2x2 output tile from a 4x4 input
tile with 16 point-wise contractions — 4 MACs/output — a 2.25x MAC
reduction on the ops that are ~90% of the UNet's 380 GFLOP/image
(docs/PERFORMANCE.md).  Since the v5e's dense bf16 ceiling (~126-157 TFLOP/s
on GEMMs) sits below the 190 TFLOP/s the 500-slices/s target implies,
*reducing FLOPs is the only sound route* — scheduling cannot get there.

Shape of the computation (all XLA; the 16 point GEMMs batch perfectly on the
MXU):

  P[a,b]   = stride-2 planes of the padded input         (gather-free slices)
  V        = B^T d B     : einsum over the 4x4 tile dims  (adds only — all
                           B^T entries are 0/±1, f32)
  U        = G g G^T     : weight transform, f32, once per call
  M[x,y]   = V[x,y] @ U[x,y] : 16 batched GEMMs, bf16 in / f32 out
  Y        = A^T M A     : adds only, then interleave 2x2 tiles back

Numerics: transforms in float32, GEMM operands cast to the model compute
dtype (bf16 default).  Max deviation vs the direct conv is at the bf16
noise level (verified in tests/test_winograd.py); argmax masks are expected
to match the direct path at IoU >= 0.999.

Enabled with ``ModelConfig(conv_impl="experimental_winograd")`` — an experimental,
measured-slower research path (docs/PERFORMANCE.md); the product default is "xla".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BT = np.array(
    [[1, 0, -1, 0],
     [0, 1, 1, 0],
     [0, -1, 1, 0],
     [0, 1, 0, -1]], np.float32)
_G = np.array(
    [[1, 0, 0],
     [0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5],
     [0, 0, 1]], np.float32)
_AT = np.array(
    [[1, 1, 1, 0],
     [0, 1, -1, -1]], np.float32)


def transform_weights(w: jax.Array) -> jax.Array:
    """(3,3,C,D) -> U (4,4,C,D), float32 (G w G^T over the spatial dims)."""
    g = jnp.asarray(_G)
    return jnp.einsum("xi,yj,ijcd->xycd", g, g, w.astype(jnp.float32))


def conv3x3_winograd(x: jax.Array, w: jax.Array, b: jax.Array, *,
                     relu: bool = True,
                     gemm_dtype=jnp.bfloat16,
                     batch_chunk: int = 4) -> jax.Array:
    """3x3 stride-1 SAME conv + bias (+ReLU) via Winograd F(2x2,3x3).

    x: (B, H, W, C) with even H, W; w: (3,3,C,D) HWIO; returns x.dtype.

    The V/M intermediates are 4x the activation size; to bound peak HBM the
    batch is processed in ``batch_chunk`` chunks via lax.map (XLA pipelines
    the chunks; each chunk's GEMMs are still MXU-sized).
    """
    B, H, W, C = x.shape
    D = w.shape[-1]
    U = transform_weights(w).astype(gemm_dtype)  # (4,4,C,D), shared

    if B > batch_chunk and B % batch_chunk == 0:
        xs = x.reshape(B // batch_chunk, batch_chunk, H, W, C)
        y = lax.map(
            lambda xc: _winograd_chunk(xc, U, b, relu=relu,
                                       gemm_dtype=gemm_dtype),
            xs,
        )
        return y.reshape(B, H, W, D)
    return _winograd_chunk(x, U, b, relu=relu, gemm_dtype=gemm_dtype)


def _winograd_chunk(x: jax.Array, U: jax.Array, b: jax.Array, *,
                    relu: bool, gemm_dtype) -> jax.Array:
    B, H, W, C = x.shape
    D = U.shape[-1]
    assert H % 2 == 0 and W % 2 == 0, (H, W)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # Stride-2 planes P[a,b] (B, H/2, W/2, C): P[a,b][t_r,t_c] = xp[2t_r+a, 2t_c+b]
    planes = [
        [xp[:, a : a + H : 2, bb : bb + W : 2, :] for bb in range(4)]
        for a in range(4)
    ]
    P = jnp.stack([jnp.stack(row) for row in planes])  # (4,4,B,H/2,W/2,C)

    bt = jnp.asarray(_BT)
    V = jnp.einsum("xa,yb,abnhwc->xynhwc", bt, bt, P.astype(jnp.float32))

    M = jnp.einsum(
        "xynhwc,xycd->xynhwd",
        V.astype(gemm_dtype),
        U,
        preferred_element_type=jnp.float32,
    )

    at = jnp.asarray(_AT)
    Y = jnp.einsum("ux,vy,xynhwd->nhwuvd", at, at, M)

    # (B, H/2, W/2, 2, 2, D) -> (B, H, W, D)
    Y = Y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, D)
    Y = Y + b.astype(Y.dtype)
    if relu:
        Y = jnp.maximum(Y, 0.0)
    return Y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas-fused Winograd: transforms live in VMEM around the 16 MXU dots —
# the XLA formulation above is correct but materializes V/M to HBM and
# measures ~15x slower in-model; this kernel is the production path.
# ---------------------------------------------------------------------------

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick(total, candidates):
    for c in candidates:
        if total % c == 0:
            return c
    return total


def _wino_kernel(p_ref, u_ref, b_ref, out_ref, acc, *, TR, W2, KC, TD, n_k,
                 relu):
    """One cell: one (row-band, out-tile, in-channel step).

    The inverse transform distributes over the channel-chunk sum, so the
    accumulator holds the four OUTPUT points Y[u,v] (not the 16 Winograd
    points) — 4x less VMEM, which buys 4x larger row tiles and MXU-sized
    dots (M = TR*W2 ~ 1024)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for pt in range(16):
        xi, yi = divmod(pt, 4)
        # V_pt = sum_ab BT[xi,a] BT[yi,b] P[a,b] — 4 nonzero terms, +-1 coefs.
        v = None
        for a in range(4):
            ca = float(_BT[xi, a])
            if ca == 0.0:
                continue
            for bb in range(4):
                cb = float(_BT[yi, bb])
                if cb == 0.0:
                    continue
                t = p_ref[4 * a + bb, 0]
                t = t if ca * cb > 0 else -t
                v = t if v is None else v + t
        m = jax.lax.dot_general(
            v.reshape(TR * W2, KC),
            u_ref[pt],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TR, W2, TD)
        # Scatter into the 4 output points: Y[u,v] += AT[u,xi] AT[v,yi] m.
        for u in range(2):
            cu = float(_AT[u, xi])
            if cu == 0.0:
                continue
            for vv in range(2):
                cv = float(_AT[vv, yi])
                if cv == 0.0:
                    continue
                acc[2 * u + vv] += m if cu * cv > 0 else -m

    @pl.when(k == n_k - 1)
    def _():
        bias = b_ref[0].astype(jnp.float32)
        for uv in range(4):
            y = acc[uv] + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            out_ref[uv] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "tr", "kc", "td", "interpret")
)
def conv3x3_winograd_pallas(x: jax.Array, w: jax.Array, b: jax.Array, *,
                            relu: bool = True,
                            tr=None, kc=None, td=None,
                            interpret: bool = False) -> jax.Array:
    """Fused Winograd F(2x2,3x3) conv+bias(+ReLU), NHWC x HWIO -> NHWC.

    XLA prepares the 16 stride-2 planes and the final 2x2 interleave; the
    kernel does everything else on-chip.
    """
    B, H, W, C = x.shape
    D = w.shape[-1]
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    H2, W2 = H // 2, W // 2

    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    planes = [
        xp[:, a : a + H : 2, bb : bb + W : 2, :]
        for a in range(4)
        for bb in range(4)
    ]
    P = jnp.stack(planes)  # (16, B, H2, W2, C)

    U = transform_weights(w).astype(dtype).reshape(16, C, D)
    b2 = b.reshape(1, D)

    KC = kc or _pick(C, (128, 256, 64, 512, 32, 16, 8, 4, 2, 1))
    TD = td or _pick(D, (128, 256, 64, 512, 32, 16, 8, 4, 2, 1))
    if tr:
        TR = tr
    else:
        # Budget VMEM: P block 16*TR*W2*KC*2B and acc 4*TR*W2*TD*4B under
        # ~4 MiB each; prefer M = TR*W2 >= 1024 for the MXU.
        TR = 1
        while (
            TR * 2 <= H2
            and H2 % (TR * 2) == 0
            and 16 * (TR * 2) * W2 * KC * 2 <= 4 * 1024 * 1024
            and 4 * (TR * 2) * W2 * TD * 4 <= 4 * 1024 * 1024
        ):
            TR *= 2
    n_h, n_k = H2 // TR, C // KC

    kernel = functools.partial(
        _wino_kernel, TR=TR, W2=W2, KC=KC, TD=TD, n_k=n_k, relu=relu
    )
    out = pl.pallas_call(
        kernel,
        grid=(B * n_h, D // TD, n_k),
        in_specs=[
            pl.BlockSpec(
                (16, 1, TR, W2, KC),
                lambda i, j, k: (0, i // n_h, i % n_h, 0, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16, KC, TD), lambda i, j, k: (0, k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, TD), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 4, TR, W2, TD),
            lambda i, j, k: (i // n_h, 0, i % n_h, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 4, H2, W2, D), dtype),
        scratch_shapes=[pltpu.VMEM((4, TR, W2, TD), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(P, U, b2)

    # (B, [u*2+v], H2, W2, D) -> (B, H, W, D)
    out = out.reshape(B, 2, 2, H2, W2, D).transpose(0, 3, 1, 4, 2, 5)
    return out.reshape(B, H, W, D)


# ---------------------------------------------------------------------------
# v2 kernel — ablation-informed redesign (docs/PERFORMANCE.md):
#   * V is computed in XLA (add-only einsum; ~0.3 ms of HBM traffic per conv),
#   * the kernel consumes ONE V plane per grid step along an `arbitrary`
#     accumulation axis, so VMEM holds a single (TR, W2, KC) plane + the
#     4-point output accumulator — freeing the budget for M = TR*W2 >= 4096
#     dots (the regime where the Mosaic dot sustains),
#   * all specs are Blocked (V planes are disjoint), so lane-deficient C=64
#     levels work too — the Element >=128-minor restriction no longer applies,
#   * the inverse-transform coefficients ride in SMEM; acc updates are
#     predicated so only the ~2.25 live output points per Winograd point pay.
# ---------------------------------------------------------------------------

# CO[pt, uv] = AT[u, xi] * AT[v, yi] for pt = 4*xi + yi, uv = 2*u + v.
_CO = np.zeros((16, 4), np.float32)
for _pt in range(16):
    _xi, _yi = divmod(_pt, 4)
    for _u in range(2):
        for _v in range(2):
            _CO[_pt, 2 * _u + _v] = _AT[_u, _xi] * _AT[_v, _yi]


def _wino2_kernel(co_ref, v_ref, u_ref, b_ref, out_ref, acc, *, n_s, relu):
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    TR, W2, KC = v_ref.shape
    TD = u_ref.shape[-1]
    m = lax.dot_general(
        v_ref[...].reshape(TR * W2, KC),
        u_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(TR, W2, TD)

    pt = s // (n_s // 16)
    for uv in range(4):
        c = co_ref[pt, uv]

        @pl.when(c != 0.0)
        def _(uv=uv, c=c):
            acc[uv] += c * m

    @pl.when(s == n_s - 1)
    def _():
        bias = b_ref[0].astype(jnp.float32)
        for uv in range(4):
            y = acc[uv] + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            out_ref[uv] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "tr", "kc", "td", "interpret")
)
def conv3x3_winograd_v2(x: jax.Array, w: jax.Array, b: jax.Array, *,
                        relu: bool = True,
                        tr=None, kc=None, td=None,
                        interpret: bool = False) -> jax.Array:
    """Winograd F(2x2,3x3) conv+bias(+ReLU), plane-per-step accumulation."""
    B, H, W, C = x.shape
    D = w.shape[-1]
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    H2, W2 = H // 2, W // 2
    dtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    planes = [
        xp[:, a : a + H : 2, bb : bb + W : 2, :]
        for a in range(4)
        for bb in range(4)
    ]
    P = jnp.stack(planes).reshape(4, 4, B, H2, W2, C)
    bt = jnp.asarray(_BT)
    V = jnp.einsum("xa,yb,abnhwc->xynhwc", bt, bt,
                   P.astype(jnp.float32)).astype(dtype)
    V = V.reshape(16, B, H2, W2, C)

    U = transform_weights(w).astype(dtype).reshape(16, C, D)
    b2 = b.reshape(1, D)
    co = jnp.asarray(_CO)

    KC = kc or _pick(C, (128, 256, 64, 512, 32, 16, 8, 4, 2, 1))
    TD = td or _pick(D, (128, 256, 64, 512, 32, 16, 8, 4, 2, 1))
    n_k, n_d = C // KC, D // TD
    if tr:
        TR = tr
    else:
        # VMEM: f32 accumulator (4*TR*W2*TD*4 B) dominates; cap it at 4 MiB
        # (with the revisited out block and double-buffered V/U under it)
        # while growing M = TR*W2 toward the >=2048 regime the dot needs.
        TR = 1
        while (
            TR * 2 <= H2
            and H2 % (TR * 2) == 0
            and (TR * 2) * W2 * TD <= 262144
            and (TR * 2) * W2 * KC * 2 <= 1024 * 1024
        ):
            TR *= 2
    n_h = H2 // TR
    n_s = 16 * n_k

    kernel = functools.partial(_wino2_kernel, n_s=n_s, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=(B * n_h, n_d, n_s),
        in_specs=[
            pl.BlockSpec((16, 4), lambda i, j, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (None, None, TR, W2, KC),
                lambda i, j, s, n_h=n_h, n_k=n_k: (
                    s // n_k, i // n_h, i % n_h, 0, s % n_k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, KC, TD),
                lambda i, j, s, n_k=n_k: (s // n_k, s % n_k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, TD), lambda i, j, s: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 4, TR, W2, TD),
            lambda i, j, s, n_h=n_h: (i // n_h, 0, i % n_h, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 4, H2, W2, D), dtype),
        scratch_shapes=[pltpu.VMEM((4, TR, W2, TD), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(co, V, U, b2)

    out = out.reshape(B, 2, 2, H2, W2, D).transpose(0, 3, 1, 4, 2, 5)
    return out.reshape(B, H, W, D)
