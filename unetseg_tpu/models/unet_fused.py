"""Fused-serving forward path: u8 -> class mask with Pallas mega-kernels.

The production inference program (engine._pipeline) spends ~60% of its HBM
traffic in the two 512² levels (see ops/fused_level.py header).  This module
composes:

  u8 --conv1_l_from_u8 (XLA, normalize folded)--> L-layout conv1
     --enc1_fused (Pallas: conv2 + skip + pool)--> skip_pe, pooled_pad
     --XLA mid-section (enc2..dec2, unchanged math)--> z
     --dec1_head_fused (Pallas: up + concat + conv1 + conv2 + head + argmax)
     --> (B, H, W) uint8 mask

Numerics match models/unet.apply + ops/decode.decode_mask to bf16 tolerance
(identical op order inside each conv; fp32 accumulation in the kernels);
mask agreement is asserted in tests/test_fused_level.py and the engine's
parity suite.

Used when ``ModelConfig.conv_impl == "experimental_fused"`` — an **experimental opt-in**,
not the serving default: measured end-to-end it loses to the XLA path
(131 vs 99 ms/batch-32; the operand-assembly tax, docs/PERFORMANCE.md
round-2 section), so ``config.py`` defaults to ``conv_impl="xla"`` and the
engine only routes here when explicitly configured.  Only the flagship
geometry is supported: depth 4, 512², base 64 — the shapes the reference
contract fixes (/root/reference/src/process.cpp:70).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.ops.fused_level import (
    conv1_l_from_u8, dec1_head_fused, enc1_fused)

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def supports(cfg: ModelConfig) -> bool:
    """The fused path covers the flagship geometry only."""
    # stem must be 1: conv1_l_from_u8 hard-codes Cin=1 (u8[..., None]); a
    # space-to-depth stem checkpoint would pass the other checks and crash
    # at trace time instead of falling back to the standard path.
    return (cfg.arch == "unet" and cfg.depth >= 2
            and getattr(cfg, "stem", 1) == 1
            and cfg.image_size % 4 == 0
            and (cfg.image_size + 4) % 12 == 0
            and cfg.num_classes == 3)


def _conv(x, p, dtype, padding="SAME"):
    y = lax.conv_general_dilated(
        x, p["w"].astype(dtype), (1, 1), padding, dimension_numbers=_CONV_DN)
    return y + p["b"].astype(dtype)


def _crelu(x, p, dtype, padding="SAME"):
    return jax.nn.relu(_conv(x, p, dtype, padding))


def _pool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def apply_fused_mask(params, u8: jax.Array, cfg: ModelConfig) -> jax.Array:
    """(B, S, S) uint8 -> (B, S, S) uint8 class mask (argmax decoded)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    enc = params["encoder"]
    dec = params["decoder"]

    # --- level 1 (fused) ---------------------------------------------------
    c1 = conv1_l_from_u8(u8, enc[0]["conv1"]["w"], enc[0]["conv1"]["b"],
                         dtype=dtype)
    skip_pe, pooled_pad = enc1_fused(c1, enc[0]["conv2"]["w"],
                                     enc[0]["conv2"]["b"])

    # --- mid-section (XLA, math identical to unet.apply) -------------------
    # pooled_pad carries the H SAME-pad rows already; pad W only.
    x = lax.conv_general_dilated(
        jnp.pad(pooled_pad, ((0, 0), (0, 0), (1, 1), (0, 0))),
        enc[1]["conv1"]["w"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=_CONV_DN) + enc[1]["conv1"]["b"].astype(dtype)
    x = jax.nn.relu(x)
    x = _crelu(x, enc[1]["conv2"], dtype)
    skips = [None, x]
    x = _pool(x)
    for stage in enc[2:]:
        x = _crelu(x, stage["conv1"], dtype)
        x = _crelu(x, stage["conv2"], dtype)
        skips.append(x)
        x = _pool(x)
    x = _crelu(x, params["bottleneck"]["conv1"], dtype)
    x = _crelu(x, params["bottleneck"]["conv2"], dtype)
    for stage, skip in zip(dec[:-1], reversed(skips[1:])):
        w = stage["up"]["w"].astype(dtype)
        x = lax.conv_transpose(x, w, (2, 2), "VALID",
                               dimension_numbers=_CONV_DN) \
            + stage["up"]["b"].astype(dtype)
        x = jnp.concatenate([skip.astype(dtype), x], axis=-1)
        x = _crelu(x, stage["conv1"], dtype)
        x = _crelu(x, stage["conv2"], dtype)

    # --- level 1 decoder + head + argmax (fused) ---------------------------
    z_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    d = dec[-1]
    return dec1_head_fused(
        z_pad, skip_pe,
        d["up"]["w"], d["up"]["b"], d["conv1"]["w"], d["conv1"]["b"],
        d["conv2"]["w"], d["conv2"]["b"],
        params["head"]["w"], params["head"]["b"])
