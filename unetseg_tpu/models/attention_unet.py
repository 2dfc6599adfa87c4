"""Attention U-Net — a third model family for the framework.

The reference ships exactly one opaque architecture (the ``.trt`` plan,
/root/reference/.gitignore:2-7); the framework generalizes the model zoo
behind ``models/registry.py`` so checkpoints are self-describing.  This
module adds the attention-gated UNet (Oktay et al., "Attention U-Net:
Learning Where to Look for the Pancreas", arXiv:1804.03999 — see PAPERS.md):
each skip connection is modulated by an additive attention gate before the
decoder concat,

    a    = sigmoid(psi(relu(W_x * skip + W_g * up(x))))      # (N,H,W,1)
    skip' = skip * a

so the decoder learns to suppress encoder activations that are irrelevant
at its current resolution — the paper's lever for small-organ localisation,
which is exactly this pipeline's worst-slice regime (small organs, see
benchmarks/RESULTS_r4.md §1).

Two deliberate departures from the paper, both TPU-motivated:

* **Gating at skip resolution.**  The paper computes the gate at the coarse
  (gating-signal) resolution with a stride-2 ``W_x`` and then resamples the
  attention map back up.  Here the decoder feature is first upsampled by the
  stage's existing 2x2 transposed conv and the gate is computed directly at
  skip resolution: one fused elementwise chain on tensors XLA already
  materializes, no extra resize op, identical gate expressiveness (three
  1x1 convs around a ReLU).
* **Same TPU-first conventions as models/unet.py** — NHWC, pure pytrees,
  bf16 compute with float32 logits, static unrolled stage loop, optional
  space-to-depth ``stem`` (the serving-geometry lever) and subpixel head.

Everything downstream that dispatches on ``cfg.arch`` (engine,
batch/TTA/tiled pipelines, training, checkpointing) works with this
family unchanged.  PTQ quantization (``quantize.py``) remains
plain-UNet-only — its conv-site walk hard-codes that layout.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models.unet import (
    _conv,
    _conv3x3_relu,
    _conv_init,
    _conv_transpose,
    _depth_to_space,
    _double_conv,
    _max_pool_2x2,
    _space_to_depth,
    stage_channels,
)

Params = Dict[str, Any]


def init(rng: jax.Array,
         cfg: ModelConfig = ModelConfig(arch="attention_unet")) -> Params:
    """Build the Attention-UNet parameter pytree (float32).

    Layout matches models/unet.py plus one attention gate per decoder
    stage: ``att_x``/``att_g`` project skip and gating features to the
    inter-channel width F_int = cout // 2 (the paper's convention), and
    ``att_psi`` reduces to the single-channel gate.
    """
    chans = stage_channels(cfg)
    bottleneck = cfg.base_channels * (2 ** cfg.depth)
    # enc 2/stage + bottleneck 2 + dec 6/stage (up, att x/g/psi, conv1,
    # conv2) + head 1
    keys = iter(jax.random.split(rng, 8 * cfg.depth + 3))

    params: Params = {"encoder": [], "decoder": []}
    cin = cfg.in_channels * cfg.stem * cfg.stem
    for cout in chans:
        params["encoder"].append({
            "conv1": _conv_init(next(keys), 3, 3, cin, cout),
            "conv2": _conv_init(next(keys), 3, 3, cout, cout),
        })
        cin = cout

    params["bottleneck"] = {
        "conv1": _conv_init(next(keys), 3, 3, chans[-1], bottleneck),
        "conv2": _conv_init(next(keys), 3, 3, bottleneck, bottleneck),
    }

    cin = bottleneck
    for cout in reversed(chans):
        f_int = max(cout // 2, 1)
        params["decoder"].append({
            "up": _conv_init(next(keys), 2, 2, cin, cout),
            "att_x": _conv_init(next(keys), 1, 1, cout, f_int),
            "att_g": _conv_init(next(keys), 1, 1, cout, f_int),
            "att_psi": _conv_init(next(keys), 1, 1, f_int, 1),
            "conv1": _conv_init(next(keys), 3, 3, cout * 2, cout),
            "conv2": _conv_init(next(keys), 3, 3, cout, cout),
        })
        cin = cout

    params["head"] = _conv_init(
        next(keys), 1, 1, chans[0], cfg.num_classes * cfg.stem * cfg.stem)
    return params


def apply(params: Params, x: jax.Array,
          cfg: ModelConfig = ModelConfig(arch="attention_unet")) -> jax.Array:
    """Forward pass -> float32 logits (N, H, W, num_classes)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    impl = cfg.conv_impl
    x = x.astype(dtype)
    if cfg.stem > 1:
        x = _space_to_depth(x, cfg.stem)

    def enc_stage(x, stage):
        return _double_conv(x, stage, dtype=dtype, impl=impl)

    def dec_stage(x, skip, stage):
        g = _conv_transpose(x, stage["up"], dtype=dtype)
        skip = skip.astype(dtype)
        a = jax.nn.relu(_conv(skip, stage["att_x"], dtype=dtype)
                        + _conv(g, stage["att_g"], dtype=dtype))
        a = jax.nn.sigmoid(_conv(a, stage["att_psi"], dtype=dtype))
        x = jnp.concatenate([skip * a, g], axis=-1)
        x = _conv3x3_relu(x, stage["conv1"], dtype=dtype, impl=impl)
        return _conv3x3_relu(x, stage["conv2"], dtype=dtype, impl=impl)

    if cfg.remat:
        enc_stage = jax.checkpoint(enc_stage)
        dec_stage = jax.checkpoint(dec_stage)

    skips = []
    for stage in params["encoder"]:
        x = enc_stage(x, stage)
        skips.append(x)
        x = _max_pool_2x2(x)

    x = _double_conv(x, params["bottleneck"], dtype=dtype, impl=impl)

    for stage, skip in zip(params["decoder"], reversed(skips)):
        x = dec_stage(x, skip, stage)

    logits = _conv(x, params["head"], dtype=dtype)
    if cfg.stem > 1:
        logits = _depth_to_space(logits, cfg.stem)
    return logits.astype(jnp.float32)


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
