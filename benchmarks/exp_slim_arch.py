#!/usr/bin/env python
"""Slim-flagship architecture sweep (round 3, VERDICT item 2).

The serving contract fixes only the I/O (1x512x512 u8 in -> 3-class 512^2
mask out, /root/reference/src/process.cpp:70,162); the internals are free.
Round 2 established the pipeline is HBM-bandwidth-bound with the 512^2
64-channel levels costing ~half the batch time, so the candidates below
attack bytes (and FLOPs) directly:

  A  base-64 depth-4                      (the flagship; 380 GFLOP/img)
  B  base-32 depth-4                      (4x fewer MACs, 2x fewer hi-res bytes)
  C  s2d2 + base-64 depth-3 + d2s head    (no 512^2 internals at all)
  D  s2d2 + base-64 depth-4 + d2s head    (same, deeper)
  E  base-48 depth-4
  F  s2d2 + base-96 depth-4 + d2s head    (wider at 256^2 for accuracy headroom)

s2d2 = space-to-depth 2x2 stem (512^2x1 -> 256^2x4); d2s head = the head
emits 4*num_classes channels at 256^2 which depth-to-space rearranges into
512^2x3 logits (a learned subpixel upsample).  Measures the full production
device program (u8 normalize -> UNet -> argmax) at batch 32.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.ops import decode, preprocess


def sync(out):
    return int(jax.device_get(out[:1, :1, :1]).ravel()[0])


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


def s2d(x, r=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // r, w // r, r * r * c)


def d2s(x, r=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c // (r * r))


def make_pipeline(cfg, stem):
    def pipeline(params, u8):
        x = preprocess.model_input_from_u8(u8)[..., None]
        if stem:
            x = s2d(x)
        logits = unet.apply(params, x, cfg)
        if stem:
            logits = d2s(logits)
        return decode.decode_mask(logits, 3)

    return jax.jit(pipeline)


def main():
    batch = 32
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, size=(batch, 512, 512), dtype=np.uint8))

    variants = [
        ("A base64 d4",        ModelConfig(), False),
        ("B base32 d4",        ModelConfig(base_channels=32), False),
        ("C s2d2 base64 d3",   ModelConfig(in_channels=4, num_classes=12, depth=3), True),
        ("D s2d2 base64 d4",   ModelConfig(in_channels=4, num_classes=12), True),
        ("E base48 d4",        ModelConfig(base_channels=48), False),
        ("F s2d2 base96 d4",   ModelConfig(in_channels=4, num_classes=12, base_channels=96), True),
        # round-3b: stem=4 sweep (128² levels) via the production stem path
        ("G s2d4 base64 d2",   ModelConfig(stem=4, depth=2), False),
        ("H s2d4 base64 d3",   ModelConfig(stem=4, depth=3), False),
        ("I s2d4 base96 d3",   ModelConfig(stem=4, depth=3, base_channels=96), False),
    ]

    results = {}
    for name, cfg, stem in variants:
        params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
        n_par = unet.param_count(params)
        fn = make_pipeline(cfg, stem)
        dt = timeit(fn, (params, u8), iters=10)
        sps = batch / dt
        results[name] = {"ms_per_batch": round(dt * 1e3, 1),
                         "slices_per_sec": round(sps, 1),
                         "params_M": round(n_par / 1e6, 2)}
        print(f"{name:22s} {dt*1e3:7.1f} ms/b32  {sps:7.1f} slices/s  "
              f"{n_par/1e6:6.2f} M params", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
