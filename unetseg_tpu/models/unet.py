"""TPU-native UNet (depth-4, 64-channel base, 3-class head).

The reference ships the network only as an opaque TensorRT plan
(``/root/reference/.gitignore:2-7`` reveals the PyTorch -> ONNX -> TRT chain);
the in-code contract is input "input" = 1x1x512x512 f32 and output "output" =
1xCx512x512 logits with C=3 (``/root/reference/src/process.cpp:70,80-85,162``).
We rebuild the classic UNet explicitly, TPU-first:

* **NHWC layout** — the native TPU conv layout; channels ride the 128-wide
  lane dimension of the MXU/VPU.
* **bfloat16 compute** — params live in float32, castable to bf16 per call;
  logits are always returned float32 so the argmax decode matches the
  reference's f32 semantics.
* **Pure functions + pytree params** — `init(rng)` builds the parameter
  pytree, `apply(params, x)` is a pure traced function; both compose with
  jit/vmap/pjit/shard_map and with `jax.checkpoint` for training.
* **Static shapes, no Python control flow under trace** — the stage loop is
  unrolled at trace time (depth is a static config), so XLA sees one flat
  graph it can fuse and schedule, the analog of the reference's captured CUDA
  Graph (``src/process.cpp:99-105``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from unetseg_tpu.config import ModelConfig

Params = Dict[str, Any]

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def _he_normal(key, shape, fan_in, dtype=jnp.float32):
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def _conv_init(key, kh, kw, cin, cout):
    wkey, _ = jax.random.split(key)
    return {
        "w": _he_normal(wkey, (kh, kw, cin, cout), fan_in=kh * kw * cin),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _conv(x, p, *, stride=1, dtype):
    w = p["w"].astype(dtype)
    y = lax.conv_general_dilated(
        x.astype(dtype),
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=_CONV_DN,
    )
    return y + p["b"].astype(dtype)


def _conv_transpose(x, p, *, stride=2, dtype):
    """2x2 stride-2 transposed conv (the reference UNet's up-sampler)."""
    w = p["w"].astype(dtype)  # (kh, kw, cin, cout)
    y = lax.conv_transpose(
        x.astype(dtype),
        w,
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=_CONV_DN,
    )
    return y + p["b"].astype(dtype)


def _conv3x3_relu(x, p, *, dtype, impl="xla"):
    """Fused 3x3 conv + bias + ReLU.

    impl: "xla" (the product default — measured fastest end-to-end) or
    "experimental_pallas" (VMEM-accumulator kernel, kept as the documented
    Pallas exemplar; loses in-model — see docs/PERFORMANCE.md for the
    measurements behind the demotion).
    """
    if impl == "experimental_pallas":
        from unetseg_tpu.ops.pallas_conv import conv3x3_bias_act

        return conv3x3_bias_act(
            x.astype(dtype), p["w"].astype(dtype), p["b"].astype(dtype)
        )
    return jax.nn.relu(_conv(x, p, dtype=dtype))


def _double_conv(x, p, *, dtype, impl="xla"):
    """conv3x3 -> ReLU -> conv3x3 -> ReLU (one UNet stage)."""
    x = _conv3x3_relu(x, p["conv1"], dtype=dtype, impl=impl)
    x = _conv3x3_relu(x, p["conv2"], dtype=dtype, impl=impl)
    return x


def _max_pool_2x2(x):
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def stage_channels(cfg: ModelConfig) -> Sequence[int]:
    """Encoder channel widths, e.g. (64, 128, 256, 512) for depth 4."""
    return tuple(cfg.base_channels * (2**i) for i in range(cfg.depth))


def _space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """(N, H, W, C) -> (N, H/r, W/r, r*r*C) block rearrangement."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // r, w // r, r * r * c)


def _depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """(N, H, W, r*r*C) -> (N, H*r, W*r, C), inverse of _space_to_depth."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c // (r * r))


def init(rng: jax.Array, cfg: ModelConfig = ModelConfig()) -> Params:
    """Build the UNet parameter pytree (float32)."""
    chans = stage_channels(cfg)
    bottleneck = cfg.base_channels * (2**cfg.depth)
    # enc 2/stage + bottleneck 2 + dec 3/stage (up+conv1+conv2) + head 1
    # (the old formula undercounted and papered over it with a *2 split —
    # a "simplification" dropping the *2 would have StopIteration'd)
    n_keys = 5 * cfg.depth + 3
    keys = iter(jax.random.split(rng, n_keys))

    params: Params = {"encoder": [], "decoder": []}
    cin = cfg.in_channels * cfg.stem * cfg.stem
    for cout in chans:
        params["encoder"].append(
            {
                "conv1": _conv_init(next(keys), 3, 3, cin, cout),
                "conv2": _conv_init(next(keys), 3, 3, cout, cout),
            }
        )
        cin = cout

    params["bottleneck"] = {
        "conv1": _conv_init(next(keys), 3, 3, chans[-1], bottleneck),
        "conv2": _conv_init(next(keys), 3, 3, bottleneck, bottleneck),
    }

    cin = bottleneck
    for cout in reversed(chans):
        params["decoder"].append(
            {
                "up": _conv_init(next(keys), 2, 2, cin, cout),
                "conv1": _conv_init(next(keys), 3, 3, cout * 2, cout),
                "conv2": _conv_init(next(keys), 3, 3, cout, cout),
            }
        )
        cin = cout

    params["head"] = _conv_init(
        next(keys), 1, 1, chans[0], cfg.num_classes * cfg.stem * cfg.stem
    )
    return params


@partial(jax.jit, static_argnames=("cfg",))
def apply_jit(params: Params, x: jax.Array, cfg: ModelConfig = ModelConfig()):
    return apply(params, x, cfg)


def apply(params: Params, x: jax.Array, cfg: ModelConfig = ModelConfig()) -> jax.Array:
    """UNet forward pass.

    Args:
      params: pytree from :func:`init`.
      x: NHWC batch, float input in [0, 1]; H and W must be divisible by
        ``2**depth`` (the reference fixes 512x512, src/process.cpp:70).

    Returns:
      float32 logits, shape (N, H, W, num_classes).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    impl = cfg.conv_impl
    x = x.astype(dtype)
    if cfg.stem > 1:
        # Slim-flagship stem: all internal tensors live at (H/stem, W/stem);
        # the subpixel head below restores full resolution.  I/O contract
        # (512² in, num_classes 512² logits out) is unchanged.
        x = _space_to_depth(x, cfg.stem)

    def enc_stage(x, stage):
        return _double_conv(x, stage, dtype=dtype, impl=impl)

    def dec_stage(x, skip, stage):
        x = _conv_transpose(x, stage["up"], dtype=dtype)
        x = jnp.concatenate([skip.astype(dtype), x], axis=-1)
        x = _conv3x3_relu(x, stage["conv1"], dtype=dtype, impl=impl)
        return _conv3x3_relu(x, stage["conv2"], dtype=dtype, impl=impl)

    if cfg.remat:  # trade recompute for HBM in the backward pass
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
        logits = _depth_to_space(logits, cfg.stem)  # learned subpixel upsample
    return logits.astype(jnp.float32)


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
