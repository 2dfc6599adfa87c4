"""Per-slice confidence statistics for cascade serving.

The compact serving student's residual failures are boundary-precision
failures (worst case: concave rims, see benchmarks/RESULTS_r4.md §7) — the
interior of an organ is never in doubt, so a whole-image confidence mean
washes the signal out.  ``boundary_margin`` therefore scores only the
pixels that decide fg-IoU: the 3x3 boundary band of the PREDICTED mask.

All ops fuse into the serving executable (top-2 over the logits the program
already holds + two reduce_window passes); the only extra D2H is one scalar
per slice.  The reference has no analog — its accuracy contract lives
entirely in the opaque .trt engine — but cascade routing is the standard
production answer to a compact model's tail (`docs/PERFORMANCE.md` cascade
section), and the router must be cheap enough to run on every slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from unetseg_tpu.ops import morphology


def margin_map(logits: jax.Array) -> jax.Array:
    """Top1-minus-top2 logit margin per pixel; (..., H, W, C) -> (..., H, W).

    The margin of the argmax decision (ops/decode.py semantics): how far the
    winning class logit sits above the runner-up.  For the reference's 3-class
    contract this is computed with explicit pairwise max/min compares — pure
    VPU ops XLA fuses into the producer.  ``lax.top_k`` here measured a
    catastrophic +127% on the whole serving program at batch 128 (it lowers
    to a sort; benchmarks/exp_cascade_cost.py), MORE than running an entire
    second UNet; the compare form is the fix.  C != 3 falls back to top_k.
    """
    if logits.shape[-1] == 3:
        l0, l1, l2 = (logits[..., 0], logits[..., 1], logits[..., 2])
        hi = jnp.maximum(l0, l1)
        lo = jnp.minimum(l0, l1)
        top = jnp.maximum(hi, l2)
        second = jnp.maximum(lo, jnp.minimum(hi, l2))
        return (top - second).astype(jnp.float32)
    top2 = lax.top_k(logits, 2)[0]
    return (top2[..., 0] - top2[..., 1]).astype(jnp.float32)


def boundary_band(mask: jax.Array, size: int = 3) -> jax.Array:
    """Pixels within the morphological gradient of the foreground mask.

    dilate(fg) XOR erode(fg) with a ``size`` x ``size`` rect window — the rim
    band whose pixel-level decisions move fg-IoU.  (..., H, W) -> bool.
    """
    # equality, not >=: at num_classes > 3 only class 2 is the reference's
    # foreground (src/postprocess.cpp:5-7); >= silently banded extra classes
    fg = mask == 2  # FOREGROUND_VALUE
    return morphology.dilate(fg, size) ^ morphology.erode(fg, size)


def boundary_margin(logits: jax.Array, mask: jax.Array,
                    size: int = 3) -> jax.Array:
    """Mean decision margin over the predicted boundary band, per slice.

    (N, H, W, C) logits + (N, H, W) argmax mask -> (N,) float32.  Slices
    with no predicted foreground (empty band) have no boundary to be wrong
    about; they score the global margin mean so a confident-empty slice is
    not routed to the fallback model.
    """
    m = margin_map(logits)
    band = boundary_band(mask, size).astype(jnp.float32)
    axes = tuple(range(1, m.ndim))
    band_n = jnp.sum(band, axis=axes)
    band_sum = jnp.sum(m * band, axis=axes)
    global_mean = jnp.mean(m, axis=axes)
    return jnp.where(band_n > 0, band_sum / jnp.maximum(band_n, 1.0),
                     global_mean)
