"""Sliding-window inference with overlap blending (BASELINE config 3).

For inputs larger than the network's 512² field (1024² pathology/dermoscopy
tiles, whole-slide crops), the reference simply *downsamples everything to
512²* (``/root/reference/src/preprocess.cpp:81``), losing resolution.  The
TPU framework adds true high-resolution inference:

* the image is cut into a static grid of 512² windows with configurable
  overlap (the "sequence" of the spatial domain, SURVEY §5),
* all windows run as ONE sharded batch over the ``dp`` mesh axis,
* per-class logits are blended back with a separable cosine (Hann) ramp
  weight map — seams vanish because every pixel is a convex combination of
  all windows covering it,
* the blended logit canvas is decoded + postprocessed as a single image.

Everything is static-shaped: the window grid is computed at trace time from
the (static) image shape, so XLA sees a fixed gather/scatter pattern.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry as model_registry
from unetseg_tpu.ops import decode, postprocess


def window_grid(size: int, window: int, stride: int) -> List[int]:
    """Static window origins covering [0, size) with the final window clamped
    flush to the edge (every pixel covered, no out-of-bounds)."""
    if size <= window:
        return [0]
    starts = list(range(0, size - window + 1, stride))
    if starts[-1] != size - window:
        starts.append(size - window)
    return starts


@functools.lru_cache(maxsize=8)
def _hann_weight(window: int) -> np.ndarray:
    """Separable raised-cosine blend weight, strictly positive."""
    r = np.arange(window, dtype=np.float64)
    w1 = 0.5 - 0.5 * np.cos(2.0 * np.pi * (r + 0.5) / window)
    w1 = np.maximum(w1, 1e-3)
    return (w1[:, None] * w1[None, :]).astype(np.float32)


def extract_windows(img: jax.Array, window: int, stride: int) -> jax.Array:
    """(H, W) -> (n_windows, window, window); static grid, unrolled slices.

    Requires H >= window and W >= window — the pipeline entry points
    edge-pad smaller images first (:func:`_pad_to_window`)."""
    h, w = img.shape
    ys = window_grid(h, window, stride)
    xs = window_grid(w, window, stride)
    tiles = [
        jax.lax.slice(img, (y, x), (y + window, x + window))
        for y in ys
        for x in xs
    ]
    return jnp.stack(tiles)


def _pad_to_window(img: jax.Array, window: int):
    """Edge-pad the trailing (H, W) axes up to the window size.

    Images smaller than one window previously crashed every library entry
    point at trace time (lax.slice out of bounds) even though window_grid
    documents the clamp; the engine carried a private workaround
    (engine.infer_tiled) — now the library handles it.  Returns
    (padded, ph, pw) so callers crop the result back."""
    h, w = img.shape[-2], img.shape[-1]
    ph, pw = max(0, window - h), max(0, window - w)
    if ph or pw:
        pad = ((0, 0),) * (img.ndim - 2) + ((0, ph), (0, pw))
        img = jnp.pad(img, pad, mode="edge")
    return img, ph, pw


def _resolve_overlap(window: int, overlap) -> int:
    """None -> window//2 (the overlap-add fast-path default); validate."""
    ov = window // 2 if overlap is None else int(overlap)
    if not 0 <= ov < window:
        raise ValueError(
            f"overlap must be in [0, window); got overlap={ov}, "
            f"window={window}")
    return ov


@functools.lru_cache(maxsize=32)
def _inv_weight_sum(h: int, w: int, window: int, stride: int) -> np.ndarray:
    """1 / (summed Hann coverage) — a trace-time constant (h, w, 1)."""
    weight = _hann_weight(window)
    wsum = np.zeros((h, w), np.float32)
    for y in window_grid(h, window, stride):
        for x in window_grid(w, window, stride):
            wsum[y:y + window, x:x + window] += weight
    return (1.0 / wsum)[..., None]


def _regular_grid(starts: List[int], stride: int, window: int) -> bool:
    """True when the grid is uniform-stride and the stride divides the
    window — the overlap-add fast path's preconditions."""
    return (window % stride == 0
            and all(b - a == stride for a, b in zip(starts, starts[1:])))


def _overlap_add(weighted: jax.Array, ny: int, nx: int, window: int,
                 stride: int) -> jax.Array:
    """(ny*nx, window, window, C) weighted tiles -> (h, w, C) canvas sum.

    Classic overlap-add: with a uniform stride s dividing the window
    (m = window/s chunks), chunk j of grid-row k lands at canvas row-block
    k+j, so the canvas is m shifted adds of a reshaped tile volume per
    axis — HBM traffic ~= m passes over the TILE volume instead of
    materializing one full (h, w, C) canvas per tile.  The pad-and-stack
    form measured blend-bound at 1024²x8 (107 ms of a 151 ms program);
    this form is ~2 volume passes (benchmarks/RESULTS_r4.md config-3 note).
    """
    m = window // stride
    c = weighted.shape[-1]
    t = weighted.reshape(ny, nx, m, stride, window, c)
    acc = None
    for j in range(m):  # y-axis overlap-add: (ny, ...) -> (ny+m-1, ...)
        part = jnp.pad(t[:, :, j], ((j, m - 1 - j),) + ((0, 0),) * 4)
        acc = part if acc is None else acc + part
    ry = acc  # (ny+m-1, nx, stride, window, C)
    ry = ry.reshape(ny + m - 1, nx, stride, m, stride, c)
    acc2 = None
    for j in range(m):  # x-axis: (nx, ...) -> (nx+m-1, ...)
        part = jnp.pad(ry[:, :, :, j],
                       ((0, 0), (j, m - 1 - j)) + ((0, 0),) * 3)
        acc2 = part if acc2 is None else acc2 + part
    # (ny+m-1, nx+m-1, stride, stride, C) -> (h, w, C)
    h = (ny + m - 1) * stride
    w = (nx + m - 1) * stride
    return acc2.transpose(0, 2, 1, 3, 4).reshape(h, w, c)


def blend_windows(logit_tiles: jax.Array, h: int, w: int, window: int,
                  stride: int) -> jax.Array:
    """(n, window, window, C) -> (h, w, C) weighted-blended logit canvas.

    Regular grids (uniform stride dividing the window, e.g. the default
    overlap window/2 at 1024²) take the overlap-add fast path
    (_overlap_add).
    Irregular grids (edge-clamped last window) fall back to zero-padding
    each weighted tile to the full canvas with STATIC offsets and summing
    the stack — no sequential read-modify-write chain (the
    dynamic_update_slice formulation serialized 2n canvas-sized copies).
    Either way the Hann coverage normalizer folds to a trace-time constant.
    """
    ys = window_grid(h, window, stride)
    xs = window_grid(w, window, stride)
    weight = jnp.asarray(_hann_weight(window))[..., None]
    inv = jnp.asarray(_inv_weight_sum(h, w, window, stride))
    if (len(ys) > 1 and len(xs) > 1
            and _regular_grid(ys, stride, window)
            and _regular_grid(xs, stride, window)):
        return _overlap_add(logit_tiles * weight, len(ys), len(xs),
                            window, stride) * inv
    padded = [
        jax.lax.pad(
            logit_tiles[k] * weight, jnp.float32(0),
            ((y, h - window - y, 0), (x, w - window - x, 0), (0, 0, 0)))
        for k, (y, x) in enumerate((y, x) for y in ys for x in xs)
    ]
    canvas = jnp.sum(jnp.stack(padded), axis=0)
    return canvas * inv


def sliding_window_logits(params, img_f32: jax.Array, cfg: ModelConfig,
                          window: int = 512, overlap=None) -> jax.Array:
    """(H, W) float image in [0,1] -> (H, W, C) blended logits.

    ``overlap=None`` means window/2 (the product default; regular grids
    take the overlap-add fast blend)."""
    overlap = _resolve_overlap(window, overlap)
    h, w = img_f32.shape
    img_f32, ph, pw = _pad_to_window(img_f32, window)
    stride = window - overlap
    tiles = extract_windows(img_f32, window, stride)[..., None]
    logit_tiles = model_registry.apply(params, tiles, cfg)
    out = blend_windows(logit_tiles, h + ph, w + pw, window, stride)
    return out[:h, :w] if (ph or pw) else out


def make_tiled_batch_pipeline(cfg: ModelConfig, window: int = 512,
                              overlap=None, mesh=None,
                              device_postprocess=True):
    """jitted (params, u8 (B, H, W)) -> masks (B, H, W): sliding window over
    a BATCH of large tiles as ONE program.

    The per-image pipeline pays one dispatch round trip per tile (~tens of
    ms on a tunneled dev box, and window batches of 9 underfill the chip);
    batching B tiles flattens all B*n windows into a single model batch —
    the same throughput lever as BASELINE config 2 — and vmaps the blend.
    With a mesh the flat window batch is sharded over ``dp``.
    ``overlap=None`` means window/2.
    """
    ov = _resolve_overlap(window, overlap)

    def pipeline(params, u8b):
        b, h, w = u8b.shape
        u8b, ph, pw = _pad_to_window(u8b, window)
        stride = window - ov
        # extract on u8 (1-byte gathers), cast per window after: 4x less
        # gather traffic than windowing the f32 image
        tiles = jax.vmap(
            lambda im: extract_windows(im, window, stride))(u8b)[..., None]
        n = tiles.shape[1]
        flat = (tiles.reshape(b * n, window, window, 1)
                .astype(jnp.float32) / 255.0)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            flat = jax.lax.with_sharding_constraint(
                flat, NamedSharding(mesh, P("dp")))
        logit_flat = model_registry.apply(params, flat, cfg)
        logit_tiles = logit_flat.reshape(b, n, window, window, -1)
        logits = jax.vmap(
            lambda lt: blend_windows(lt, h + ph, w + pw, window, stride)
        )(logit_tiles)
        if ph or pw:
            logits = logits[:, :h, :w]
        mask = decode.decode_mask(logits, cfg.num_classes)
        if device_postprocess:
            from unetseg_tpu.parallel.batch import _device_cc

            mask = postprocess.postprocess_masks(
                mask, use_pallas_cc=_device_cc())
        return mask

    return jax.jit(pipeline)


def make_tiled_pipeline(cfg: ModelConfig, window: int = 512,
                        overlap=None, mesh=None,
                        device_postprocess=True):
    """jitted (params, u8 (H,W)) -> mask (H,W) via sliding window.

    With a mesh, the window batch is sharded over ``dp`` (tiles ride ICI to
    their chips; the blend is a cheap replicated epilogue).
    ``device_postprocess=False`` stops at the argmax decode for the engine's
    host-cleanup split.  ``overlap=None`` means window/2.
    """
    ov = _resolve_overlap(window, overlap)

    def pipeline(params, u8):
        h, w = u8.shape
        u8, ph, pw = _pad_to_window(u8, window)
        stride = window - ov
        tiles = (extract_windows(u8, window, stride)[..., None]
                 .astype(jnp.float32) / 255.0)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            tiles = jax.lax.with_sharding_constraint(
                tiles, NamedSharding(mesh, P("dp"))
            )
        logit_tiles = model_registry.apply(params, tiles, cfg)
        logits = blend_windows(logit_tiles, h + ph, w + pw, window, stride)
        if ph or pw:
            logits = logits[:h, :w]
        mask = decode.decode_mask(logits, cfg.num_classes)
        if device_postprocess:
            from unetseg_tpu.parallel.batch import _device_cc

            mask = postprocess.postprocess_mask(
                mask, use_pallas_cc=_device_cc())
        return mask

    return jax.jit(pipeline)
