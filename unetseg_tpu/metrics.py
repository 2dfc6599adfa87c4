"""Segmentation metrics — jittable evaluation utilities.

The reference measures nothing (SURVEY §6: no IoU anywhere); the BASELINE
contract grades on polygon/mask IoU, so the framework owns its metrics:
per-class IoU/Dice over label masks, batch-reduced, plus a polygon-level IoU
that rasterizes contour JSON back to masks for artifact-level comparison.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_counts(pred: jax.Array, target: jax.Array, num_classes: int
                     ) -> jax.Array:
    """(..., H, W) int masks -> (num_classes, num_classes) confusion matrix.

    Scatter-adds per SLICE in int32 (each cell is bounded by one slice's
    pixel count) and batch-reduces in float — a single flat int32 scatter
    wrapped negative past ~2.1e9 pixels (~8200 mostly-background 512²
    slices), silently corrupting IoU (round-4 review finding).  The float
    reduce is exact in x64 mode; in default f32 the worst-case rounding at
    billions of counts perturbs IoU at the 1e-7 level."""
    hw = pred.shape[-2] * pred.shape[-1] if pred.ndim >= 2 else pred.size
    p = pred.reshape(-1, hw).astype(jnp.int32)
    t = target.reshape(-1, hw).astype(jnp.int32)
    idx = t * num_classes + p

    def one(ix):
        return jnp.zeros((num_classes * num_classes,), jnp.int32).at[ix].add(1)

    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    counts = jax.vmap(one)(idx).astype(acc).sum(axis=0)
    return counts.reshape(num_classes, num_classes)


def _iou_from_cm(cm: jax.Array) -> jax.Array:
    inter = jnp.diagonal(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0)


def _dice_from_cm(cm: jax.Array) -> jax.Array:
    inter = jnp.diagonal(cm)
    denom = cm.sum(0) + cm.sum(1)
    return jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1), 1.0)


def iou_per_class(pred: jax.Array, target: jax.Array, num_classes: int
                  ) -> jax.Array:
    """Per-class intersection-over-union; classes absent from both sides
    score 1.0 (the conventional 'empty agreement' reading)."""
    return _iou_from_cm(confusion_counts(pred, target, num_classes)
                        .astype(jnp.float32))


def dice_per_class(pred: jax.Array, target: jax.Array, num_classes: int
                   ) -> jax.Array:
    return _dice_from_cm(confusion_counts(pred, target, num_classes)
                         .astype(jnp.float32))


def foreground_iou(pred: jax.Array, target: jax.Array,
                   foreground: int = 2) -> jax.Array:
    """Binary IoU of the clinically-relevant class (reference FG=2)."""
    p = pred == foreground
    t = target == foreground
    inter = jnp.sum(p & t)
    union = jnp.sum(p | t)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0)


def polygon_iou(contours_a: Sequence[Sequence[Tuple[int, int]]],
                contours_b: Sequence[Sequence[Tuple[int, int]]],
                width: int, height: int) -> float:
    """IoU between two polygon sets via rasterization (the BASELINE
    'polygon IoU vs reference output' metric)."""
    import cv2

    def raster(contours):
        m = np.zeros((height, width), np.uint8)
        cs = [np.asarray(c, np.int32).reshape(-1, 1, 2) for c in contours]
        if cs:
            cv2.fillPoly(m, cs, 1)
        return m.astype(bool)

    a, b = raster(contours_a), raster(contours_b)
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(a, b).sum() / union)


def evaluate_masks(pred: np.ndarray, target: np.ndarray,
                   num_classes: int = 3,
                   foreground: int = 2) -> Dict[str, float]:
    """Convenience batch report — ONE confusion-matrix pass (IoU, Dice and
    the binary foreground IoU all derive from it; the previous form scanned
    the masks three times)."""
    cm = np.asarray(confusion_counts(jnp.asarray(pred), jnp.asarray(target),
                                     num_classes), np.float64)
    iou = np.asarray(_iou_from_cm(jnp.asarray(cm)))
    dice = np.asarray(_dice_from_cm(jnp.asarray(cm)))
    tp = cm[foreground, foreground]
    fg_union = cm[foreground, :].sum() + cm[:, foreground].sum() - tp
    return {
        **{f"iou_class{c}": float(iou[c]) for c in range(num_classes)},
        **{f"dice_class{c}": float(dice[c]) for c in range(num_classes)},
        "mean_iou": float(iou.mean()),
        "foreground_iou": float(tp / fg_union) if fg_union > 0 else 1.0,
    }
