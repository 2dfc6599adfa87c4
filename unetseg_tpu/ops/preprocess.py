"""Preprocess: min-max scan + bilinear 512x512 downsample + uint8 quantize.

Reference semantics (``/root/reference/src/preprocess.cpp:65-118``):

* global min/max over the full uint16 buffer; ``if (mn == mx) mx = mn + 1``;
  ``scale8 = 255.0 / (mx - mn)`` in double,
* per output pixel (y, x) of the fixed 512x512 grid:
  ``fx = x * (w/512)``, ``fy = y * (h/512)`` (doubles),
  **truncating** source indices ``ix = int(fx)``, clamped neighbors
  ``ix1 = min(ix+1, w-1)``, bilinear blend in double,
* quantize ``u8 = (uchar)((v - mn) * scale8 + 0.5)`` (truncating cast).

The model input is then the uint8 image divided by 255 — the reference writes
the u8 PNG and re-reads it, so the u8 round-trip is part of the numerics and
MUST be kept (``src/process.cpp:36-39``).

Two implementations:

* :func:`preprocess_oracle_u8` — NumPy float64, bit-exact to the C++ doubles.
  This is the goldens' source of truth and the host fallback.
* :func:`resize_normalize_u8` / :func:`preprocess_batch` — the TPU path.
  All indices and blend weights depend only on the *static* (h, w) shape, so
  they are computed in float64 on the host at trace time and embedded as
  constants; the device does two gathers and a fused multiply-add chain in
  float32, then the quantize.  The bilinear kernel is separable (fx depends
  only on x, fy only on y), so the device work is: gather rows -> lerp ->
  gather cols -> lerp, which XLA fuses into one pass.  float32 blend error is
  <= ~0.02 gray levels for typical dynamic ranges; the bit-exact host path
  exists for strict parity mode (tested in tests/test_preprocess.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

OUT_SIZE = 512


# ---------------------------------------------------------------------------
# Host oracle (bit-exact float64, vectorized NumPy)
# ---------------------------------------------------------------------------

def _grid_1d(n_src: int, n_out: int):
    """Truncating bilinear sample positions along one axis (float64)."""
    step = n_src / n_out  # double division, as in preprocess.cpp:82-83
    f = np.arange(n_out, dtype=np.float64) * step
    i0 = f.astype(np.int64)  # static_cast<int> truncation (f >= 0)
    i1 = np.minimum(i0 + 1, n_src - 1)
    d = f - i0
    return i0, i1, d


def preprocess_oracle_u8(raw: np.ndarray, out_size: int = OUT_SIZE) -> np.ndarray:
    """Bit-exact reimplementation of preprocess_raw's pixel math.

    Args:
      raw: (h, w) uint16.
    Returns:
      (out_size, out_size) uint8.
    """
    raw = np.asarray(raw)
    assert raw.dtype == np.uint16 and raw.ndim == 2
    h, w = raw.shape
    mn = int(raw.min())
    mx = int(raw.max())
    if mn == mx:
        mx = mn + 1
    scale8 = 255.0 / (mx - mn)

    ix, ix1, dx = _grid_1d(w, out_size)
    iy, iy1, dy = _grid_1d(h, out_size)

    src = raw.astype(np.float64)
    v00 = src[np.ix_(iy, ix)]
    v01 = src[np.ix_(iy, ix1)]
    v10 = src[np.ix_(iy1, ix)]
    v11 = src[np.ix_(iy1, ix1)]

    dxg = dx[None, :]
    dyg = dy[:, None]
    # Exact term/association order of src/preprocess.cpp:112-115.
    v = (
        ((1 - dxg) * (1 - dyg)) * v00
        + (dxg * (1 - dyg)) * v01
        + ((1 - dxg) * dyg) * v10
        + (dxg * dyg) * v11
    )
    q = (v - mn) * scale8 + 0.5
    return np.floor(q).astype(np.uint8)  # truncating cast; q >= 0


# ---------------------------------------------------------------------------
# TPU path
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _gather_plan(h: int, w: int, out_size: int):
    """Static per-shape gather indices + f32 blend weights (host float64).

    Returns NumPy arrays (not jnp) so the cache never captures tracers; they
    embed as XLA constants at trace time.
    """
    ix, ix1, dx = _grid_1d(w, out_size)
    iy, iy1, dy = _grid_1d(h, out_size)
    return (
        iy.astype(np.int32),
        iy1.astype(np.int32),
        dy.astype(np.float32),
        ix.astype(np.int32),
        ix1.astype(np.int32),
        dx.astype(np.float32),
    )


def _bilinear_u16(raw: jax.Array, h: int, w: int, out_size: int) -> jax.Array:
    """(..., h, w) uint16 -> (..., out, out) float32 bilinear (ref semantics)."""
    iy, iy1, dy, ix, ix1, dx = _gather_plan(h, w, out_size)
    src = raw.astype(jnp.float32)
    top = jnp.take(src, iy, axis=-2)
    bot = jnp.take(src, iy1, axis=-2)
    rows = top + (bot - top) * dy[:, None]  # lerp along y
    left = jnp.take(rows, ix, axis=-1)
    right = jnp.take(rows, ix1, axis=-1)
    return left + (right - left) * dx  # lerp along x


def resize_normalize_u8(raw: jax.Array, out_size: int = OUT_SIZE) -> jax.Array:
    """Fused device preprocess for one (h, w) uint16 image -> (out, out) uint8.

    jit-compatible; (h, w) are static from the array shape.
    """
    h, w = raw.shape[-2], raw.shape[-1]
    as_i32 = raw.astype(jnp.int32)
    mn = jnp.min(as_i32, axis=(-2, -1), keepdims=True)
    mx = jnp.max(as_i32, axis=(-2, -1), keepdims=True)
    mx = jnp.where(mx == mn, mn + 1, mx)  # preprocess.cpp:92
    scale8 = 255.0 / (mx - mn).astype(jnp.float32)

    v = _bilinear_u16(raw, h, w, out_size)
    q = (v - mn.astype(jnp.float32)) * scale8 + 0.5
    return jnp.floor(q).astype(jnp.uint8)


def normalize_u8(raw: jax.Array) -> jax.Array:
    """Full-resolution min-max quantize (no resample): (..., h, w) u16 -> u8.

    The native-resolution analog of the preprocess for sliding-window mode,
    where the image is NOT downsampled to 512² (the reference always
    downsamples, src/preprocess.cpp:81 — this mode is the TPU framework's
    high-resolution extension, BASELINE config 3).
    """
    as_i32 = raw.astype(jnp.int32)
    mn = jnp.min(as_i32, axis=(-2, -1), keepdims=True)
    mx = jnp.max(as_i32, axis=(-2, -1), keepdims=True)
    mx = jnp.where(mx == mn, mn + 1, mx)
    scale8 = 255.0 / (mx - mn).astype(jnp.float32)
    q = (raw.astype(jnp.float32) - mn.astype(jnp.float32)) * scale8 + 0.5
    return jnp.floor(q).astype(jnp.uint8)


def model_input_from_u8(u8: jax.Array) -> jax.Array:
    """uint8 -> float32 in [0,1]; the reference's u8 path (process.cpp:36-39)."""
    return u8.astype(jnp.float32) / 255.0


def model_input_from_u16(u16: jax.Array) -> jax.Array:
    """uint16 -> float32 /65535; API-parity path (process.cpp:30-34)."""
    return u16.astype(jnp.float32) / 65535.0


@functools.partial(jax.jit, static_argnames=("out_size",))
def preprocess_batch(raws: jax.Array, out_size: int = OUT_SIZE
                     ) -> Tuple[jax.Array, jax.Array]:
    """Batched fused preprocess: (N, h, w) uint16 -> (u8 (N,o,o), f32 NHWC1).

    Per-image min/max (matching the reference's per-file normalization), then
    the shared static gather plan.  Returns both the uint8 artifact (for the
    PNG) and the network input including the u8 quantization round-trip.
    """
    u8 = resize_normalize_u8(raws, out_size)
    x = model_input_from_u8(u8)[..., None]
    return u8, x
