#!/usr/bin/env python
"""Per-stage timing of the fused pipeline at flagship geometry."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.ops.fused_level import (
    conv1_l_from_u8, dec1_head_fused, enc1_fused)


def sync(out):
    return int(jax.device_get(out.reshape(-1)[:1])[0])


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


def main():
    b = 32
    cfg = ModelConfig()
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (b, 512, 512), np.uint8))
    enc = params["encoder"]
    dec = params["decoder"]
    dt = jnp.bfloat16

    f_c1 = jax.jit(lambda u8: conv1_l_from_u8(
        u8, enc[0]["conv1"]["w"], enc[0]["conv1"]["b"], dtype=dt))
    c1 = f_c1(u8)
    print(f"conv1_l_from_u8: {timeit(f_c1, (u8,))*1e3:7.1f} ms", flush=True)

    f_e1 = jax.jit(lambda c1: enc1_fused(
        c1, enc[0]["conv2"]["w"], enc[0]["conv2"]["b"])[0])
    f_e1b = jax.jit(lambda c1: enc1_fused(
        c1, enc[0]["conv2"]["w"], enc[0]["conv2"]["b"]))
    skip_pe, pooled = f_e1b(c1)
    print(f"enc1_fused:      {timeit(f_e1, (c1,))*1e3:7.1f} ms", flush=True)

    z = jax.random.normal(jax.random.key(1), (b, 256, 256, 128), dt)

    f_pad = jax.jit(lambda z: jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0))))
    z_pad = f_pad(z)
    print(f"z pad:           {timeit(f_pad, (z,))*1e3:7.1f} ms", flush=True)

    d = dec[-1]

    def dec1(z_pad, skip_pe):
        return dec1_head_fused(
            z_pad, skip_pe,
            d["up"]["w"].astype(dt), d["up"]["b"].astype(dt),
            d["conv1"]["w"].astype(dt), d["conv1"]["b"].astype(dt),
            d["conv2"]["w"].astype(dt), d["conv2"]["b"].astype(dt),
            params["head"]["w"].astype(dt), params["head"]["b"].astype(dt))

    f_d1 = jax.jit(dec1)
    print(f"dec1_head_fused: {timeit(f_d1, (z_pad, skip_pe))*1e3:7.1f} ms",
          flush=True)

    for tr in (16, 32):
        f_t = jax.jit(lambda zp, sp, tr=tr: dec1_head_fused(
            zp, sp,
            d["up"]["w"].astype(dt), d["up"]["b"].astype(dt),
            d["conv1"]["w"].astype(dt), d["conv1"]["b"].astype(dt),
            d["conv2"]["w"].astype(dt), d["conv2"]["b"].astype(dt),
            params["head"]["w"].astype(dt), params["head"]["b"].astype(dt),
            tr=tr))
        print(f"dec1 tr={tr}:      {timeit(f_t, (z_pad, skip_pe))*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
