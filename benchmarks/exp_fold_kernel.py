#!/usr/bin/env python
"""Measure the Pallas fold2 kernel: isolated + in-model (full pipeline)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.ops import preprocess
from unetseg_tpu.ops.fold_conv import conv3x3_fold2

DN = ("NHWC", "HWIO", "NHWC")


def sync(out):
    return float(jax.device_get(out.reshape(-1)[:1])[0])


def timeit(fn, args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def crelu(x, p, dtype):
    w = p["w"].astype(dtype)
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN)
    return jax.nn.relu(y + p["b"].astype(dtype))


def build_pipeline(cfg, fold_hi):
    dtype = jnp.dtype(cfg.compute_dtype)

    def cr(x, p):
        cin, d = p["w"].shape[2], p["w"].shape[3]
        if fold_hi and x.shape[1] >= fold_hi and cin >= 64 and d <= 64:
            return conv3x3_fold2(
                x, p["w"].astype(dtype), p["b"].astype(dtype))
        return crelu(x, p, dtype)

    def pipeline(params, u8):
        x = preprocess.model_input_from_u8(u8)[..., None].astype(dtype)
        skips = []
        for stage in params["encoder"]:
            x = cr(x, stage["conv1"])
            x = cr(x, stage["conv2"])
            skips.append(x)
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        x = crelu(x, params["bottleneck"]["conv1"], dtype)
        x = crelu(x, params["bottleneck"]["conv2"], dtype)
        for stage, skip in zip(params["decoder"], reversed(skips)):
            w = stage["up"]["w"].astype(dtype)
            x = lax.conv_transpose(x, w, (2, 2), "VALID",
                                   dimension_numbers=DN) \
                + stage["up"]["b"].astype(dtype)
            x = jnp.concatenate([skip, x], axis=-1)
            x = cr(x, stage["conv1"])
            x = cr(x, stage["conv2"])
        wh = params["head"]["w"].astype(dtype)
        logits = lax.conv_general_dilated(x, wh, (1, 1), "SAME",
                                          dimension_numbers=DN) \
            + params["head"]["b"].astype(dtype)
        return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.uint8)

    return jax.jit(pipeline)


def main():
    b = 32
    k = jax.random.key(0)

    # isolated kernels
    for (C, D) in [(64, 64), (128, 64)]:
        x = jax.random.normal(k, (b, 512, 512, C), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, C, D), jnp.bfloat16) * 0.1
        bias = jnp.zeros((D,), jnp.bfloat16)
        fl = 2 * b * 512 * 512 * 9 * C * D

        f = jax.jit(lambda x, w, bias: conv3x3_fold2(x, w, bias))
        ms = timeit(f, (x, w, bias)) * 1e3
        print(f"fold2-pallas 512² {C}->{D}: {ms:8.2f} ms {fl/ms/1e9:6.1f} TF/s(true)")

        g = jax.jit(lambda x, w, bias: jax.nn.relu(lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DN) + bias))
        ms = timeit(g, (x, w, bias)) * 1e3
        print(f"xla          512² {C}->{D}: {ms:8.2f} ms {fl/ms/1e9:6.1f} TF/s(true)")

    # in-model
    cfg = ModelConfig()
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, size=(b, 512, 512), dtype=np.uint8))

    for name, fold_hi in [("baseline", 0), ("fold2@512", 512), ("fold2@256+", 256)]:
        fn = build_pipeline(cfg, fold_hi)
        ms = timeit(fn, (params, u8)) * 1e3
        print(f"model {name:12s} {ms:8.1f} ms  {b/ms*1e3:7.1f} slices/s")

    # numeric check fold vs baseline (bf16 tolerance)
    m0 = build_pipeline(cfg, 0)(params, u8)
    m1 = build_pipeline(cfg, 512)(params, u8)
    agree = float(jnp.mean((m0 == m1).astype(jnp.float32)))
    print(f"mask agreement fold2@512 vs baseline: {agree:.6f}")


if __name__ == "__main__":
    main()
