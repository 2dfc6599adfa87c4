#!/usr/bin/env python
"""int8 activation STORAGE (bf16 compute): halve HBM bytes on the
bandwidth-bound pipeline.  Static per-layer scales (numerics proxy; the
real path would calibrate).  Measures perf only."""

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


def build(q8: bool, q8_hi_only: bool = False):
    cfg = ModelConfig()
    dtype = jnp.bfloat16

    def quant(x):
        # static scale; storage-only quantization
        if x.shape[1] < 512 and q8_hi_only:
            return x
        s = jnp.bfloat16(0.25)
        xi = jnp.clip(x * jnp.bfloat16(1.0 / 0.25), -127, 127).astype(jnp.int8)
        return xi.astype(dtype) * s

    maybe_q = quant if (q8 or q8_hi_only) else (lambda x: x)

    def crelu(x, p):
        y = lax.conv_general_dilated(x, p["w"].astype(dtype), (1, 1), "SAME",
                                     dimension_numbers=DN)
        return maybe_q(jax.nn.relu(y + p["b"].astype(dtype)))

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
            x = jnp.concatenate([skip, up], axis=-1)
            x = crelu(x, stage["conv1"])
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
    for name, kw in (("bf16 storage", {}),
                     ("int8 storage all", {"q8": True}),
                     ("int8 storage 512² only", {"q8": False,
                                                 "q8_hi_only": True})):
        f = build(**kw) if kw else build(False)
        ms = timeit(f, (params, u8)) * 1e3
        print(f"{name:24s}: {ms:7.1f} ms  {b/ms*1e3:6.1f} slices/s",
              flush=True)


if __name__ == "__main__":
    main()
