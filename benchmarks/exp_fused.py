#!/usr/bin/env python
"""Fused mega-kernel pipeline vs baseline, flagship 512² batch-32 on TPU."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet, unet_fused
from unetseg_tpu.ops import decode, preprocess


def sync(out):
    return int(jax.device_get(out.reshape(-1)[:1])[0])


def timeit(fn, args, iters=20, warmup=2):
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = ModelConfig()
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (b, 512, 512), np.uint8))

    @jax.jit
    def baseline(params, u8):
        x = preprocess.model_input_from_u8(u8)[..., None]
        logits = unet.apply(params, x, cfg)
        return decode.decode_mask(logits, cfg.num_classes)

    @jax.jit
    def fused(params, u8):
        return unet_fused.apply_fused_mask(params, u8, cfg)

    ms_b = timeit(baseline, (params, u8)) * 1e3
    print(f"baseline: {ms_b:8.1f} ms  {b/ms_b*1e3:7.1f} slices/s", flush=True)
    ms_f = timeit(fused, (params, u8)) * 1e3
    print(f"fused:    {ms_f:8.1f} ms  {b/ms_f*1e3:7.1f} slices/s", flush=True)

    mb = np.asarray(baseline(params, u8))
    mf = np.asarray(fused(params, u8))
    print(f"mask agreement: {(mb == mf).mean():.6f}")


if __name__ == "__main__":
    main()
