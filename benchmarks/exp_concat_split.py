#!/usr/bin/env python
"""conv(concat(a,b), W) == conv(a, Wa) + conv(b, Wb): kill concat traffic."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.ops import decode, preprocess

DN = ("NHWC", "HWIO", "NHWC")


def sync(out):
    return int(jax.device_get(out.reshape(-1)[:1])[0])


def timeit(fn, args, iters=15, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def build(split_concat):
    cfg = ModelConfig()
    dtype = jnp.bfloat16

    def crelu(x, p):
        y = lax.conv_general_dilated(x, p["w"].astype(dtype), (1, 1), "SAME",
                                     dimension_numbers=DN)
        return jax.nn.relu(y + p["b"].astype(dtype))

    def dec_conv1(skip, up, p):
        if not split_concat:
            return crelu(jnp.concatenate([skip, up], axis=-1), p)
        C = skip.shape[-1]
        w = p["w"].astype(dtype)
        ys = lax.conv_general_dilated(skip, w[:, :, :C], (1, 1), "SAME",
                                      dimension_numbers=DN)
        yu = lax.conv_general_dilated(up, w[:, :, C:], (1, 1), "SAME",
                                      dimension_numbers=DN)
        return jax.nn.relu(ys + yu + p["b"].astype(dtype))

    def pipeline(params, u8):
        x = preprocess.model_input_from_u8(u8)[..., None].astype(dtype)
        skips = []
        for stage in params["encoder"]:
            x = crelu(x, stage["conv1"])
            x = crelu(x, stage["conv2"])
            skips.append(x)
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        x = crelu(x, params["bottleneck"]["conv1"])
        x = crelu(x, params["bottleneck"]["conv2"])
        for stage, skip in zip(params["decoder"], reversed(skips)):
            up = lax.conv_transpose(
                x, stage["up"]["w"].astype(dtype), (2, 2), "VALID",
                dimension_numbers=DN) + stage["up"]["b"].astype(dtype)
            x = dec_conv1(skip, up, stage["conv1"])
            x = crelu(x, stage["conv2"])
        logits = lax.conv_general_dilated(
            x, params["head"]["w"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=DN) + params["head"]["b"].astype(dtype)
        return jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.uint8)

    return jax.jit(pipeline)


def main():
    b = 32
    cfg = ModelConfig()
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (b, 512, 512), np.uint8))
    f0 = build(False)
    f1 = build(True)
    ms0 = timeit(f0, (params, u8)) * 1e3
    print(f"concat    : {ms0:7.1f} ms  {b/ms0*1e3:7.1f} slices/s", flush=True)
    ms1 = timeit(f1, (params, u8)) * 1e3
    print(f"split-sum : {ms1:7.1f} ms  {b/ms1*1e3:7.1f} slices/s", flush=True)
    m0, m1 = np.asarray(f0(params, u8)), np.asarray(f1(params, u8))
    print(f"mask agreement: {(m0 == m1).mean():.6f}")


if __name__ == "__main__":
    main()
