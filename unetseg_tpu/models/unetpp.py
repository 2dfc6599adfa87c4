"""UNet++ (nested UNet) — a second model family for the framework.

The reference ships exactly one opaque architecture; the framework
generalizes the model zoo.  UNet++ (Zhou et al., "UNet++: A Nested U-Net
Architecture for Medical Image Segmentation", arXiv:1807.10165; redesigned
skips in arXiv:1912.05074 — see PAPERS.md) replaces the plain skip
connections with dense nested decoder nodes X(i, j):

    X(i, 0) = encoder backbone (maxpool chain)
    X(i, j) = conv_block(concat(X(i, 0..j-1), up(X(i+1, j-1))))

Output head reads X(0, depth); with ``deep_supervision`` every X(0, j>=1)
gets a head and training averages their losses (inference averages logits).

Same TPU-first conventions as models/unet.py: NHWC, pure pytrees, bf16
compute, static unrolled graph, upsampling by 2x2 transposed conv.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models.unet import (
    _conv,
    _conv3x3_relu,
    _conv_init,
    _conv_transpose,
    _double_conv,
    _max_pool_2x2,
)

Params = Dict[str, Any]


def _node_in_channels(cfg: ModelConfig, i: int, j: int) -> int:
    """Input channels of node X(i, j): j prior nodes at level i (each c_i)
    plus the upsampled X(i+1, j-1) (c_i after the up-conv)."""
    c_i = cfg.base_channels * (2**i)
    return j * c_i + c_i


def init(rng: jax.Array, cfg: ModelConfig = ModelConfig(arch="unetpp")) -> Params:
    if cfg.stem != 1:
        raise ValueError("ModelConfig.stem is only supported by arch='unet'")
    chans = [cfg.base_channels * (2**i) for i in range(cfg.depth + 1)]
    keys = iter(jax.random.split(rng, 4 * (cfg.depth + 1) ** 2 + 8))

    params: Params = {"backbone": [], "nodes": {}, "heads": []}
    cin = cfg.in_channels
    for i, c in enumerate(chans):
        params["backbone"].append(
            {
                "conv1": _conv_init(next(keys), 3, 3, cin, c),
                "conv2": _conv_init(next(keys), 3, 3, c, c),
            }
        )
        cin = c

    for j in range(1, cfg.depth + 1):
        for i in range(0, cfg.depth + 1 - j):
            c_i = chans[i]
            params["nodes"][f"{i}_{j}"] = {
                "up": _conv_init(next(keys), 2, 2, chans[i + 1], c_i),
                "conv1": _conv_init(
                    next(keys), 3, 3, _node_in_channels(cfg, i, j), c_i
                ),
                "conv2": _conv_init(next(keys), 3, 3, c_i, c_i),
            }

    n_heads = cfg.depth if cfg.deep_supervision else 1
    for _ in range(n_heads):
        params["heads"].append(
            _conv_init(next(keys), 1, 1, chans[0], cfg.num_classes)
        )
    return params


def apply(params: Params, x: jax.Array,
          cfg: ModelConfig = ModelConfig(arch="unetpp")) -> jax.Array:
    """Forward pass -> float32 logits (N, H, W, num_classes).

    With deep supervision the returned logits are the mean over heads
    (the standard UNet++ "accurate mode" ensemble).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    x = x.astype(dtype)

    grid: Dict[str, jax.Array] = {}
    for i, stage in enumerate(params["backbone"]):
        x = _double_conv(x, stage, dtype=dtype, impl=cfg.conv_impl)
        grid[f"{i}_0"] = x
        if i < cfg.depth:
            x = _max_pool_2x2(x)

    for j in range(1, cfg.depth + 1):
        for i in range(0, cfg.depth + 1 - j):
            node = params["nodes"][f"{i}_{j}"]
            up = _conv_transpose(grid[f"{i + 1}_{j - 1}"], node["up"], dtype=dtype)
            feats = [grid[f"{i}_{k}"].astype(dtype) for k in range(j)] + [up]
            h = jnp.concatenate(feats, axis=-1)
            # honor cfg.conv_impl here too — the backbone did, but the
            # nested nodes hard-coded the XLA path, silently benchmarking
            # a hybrid under experimental_* impls (round-4 review finding)
            h = _conv3x3_relu(h, node["conv1"], dtype=dtype,
                              impl=cfg.conv_impl)
            h = _conv3x3_relu(h, node["conv2"], dtype=dtype,
                              impl=cfg.conv_impl)
            grid[f"{i}_{j}"] = h

    # the checkpoint's actual head count must agree with the config — a
    # DS checkpoint served with deep_supervision=False would silently feed
    # heads[0] (trained on X(0,1)) with X(0,depth) features, and zip()
    # would silently truncate the converse (round-4 review finding)
    n_heads = len(params["heads"])
    want = cfg.depth if cfg.deep_supervision else 1
    if n_heads != want:
        raise ValueError(
            f"unetpp: checkpoint has {n_heads} head(s) but "
            f"deep_supervision={cfg.deep_supervision} expects {want}")
    if cfg.deep_supervision:
        logits: List[jax.Array] = [
            _conv(grid[f"0_{j}"], head, dtype=dtype)
            for j, head in zip(range(1, cfg.depth + 1), params["heads"])
        ]
        return jnp.mean(
            jnp.stack([l.astype(jnp.float32) for l in logits]), axis=0
        )
    return _conv(grid[f"0_{cfg.depth}"], params["heads"][0], dtype=dtype).astype(
        jnp.float32
    )


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
