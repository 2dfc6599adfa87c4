#!/usr/bin/env python
"""Round-4 continuation: is there throughput left in the student geometry?

The shipped serving student (s2d4 base-64 depth-2, 1.9 M params) serves at
~7400 slices/s/chip (batch 128).  Round-3's sweep (exp_slim_arch.py) fixed
depth/stem but never varied WIDTH at the stem-4 depth-2 point; this measures
the full production device program (u8 normalize -> UNet -> argmax,
bench.py's make_pipeline) for width/depth neighbors at batch 128, random
init — raw speed only, to decide whether a re-distillation is worth the
schedule (21600 steps).  Accuracy risk noted per candidate:

  base-64 d2   shipped baseline (gate: fg_iou_min 0.9995)
  base-48 d2   0.56x params — gate risk moderate
  base-32 d2   0.25x params — gate risk high
  base-96 d2   1.9x params  — speed cost, accuracy headroom (for reference)
  base-64 d3   capacity ablation's geometry (known: WORSE accuracy; speed
               datum completes the table)

Timing protocol per CLAUDE.md: queue N dispatches, sync once by element
fetch (block_until_ready is unreliable through the tunnel).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry as model_registry
from unetseg_tpu.ops import decode, preprocess

BATCH = 128
ITERS = 30


def make_pipeline(cfg):
    @jax.jit
    def pipeline(p, u8):
        x = preprocess.model_input_from_u8(u8)[..., None]
        logits = model_registry.apply(p, x, cfg)
        return decode.decode_mask(logits, cfg.num_classes)
    return pipeline


def n_params(params):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def main() -> int:
    candidates = [
        ("base64_d2_shipped", ModelConfig(stem=4, base_channels=64, depth=2)),
        ("base48_d2", ModelConfig(stem=4, base_channels=48, depth=2)),
        ("base32_d2", ModelConfig(stem=4, base_channels=32, depth=2)),
        ("base96_d2", ModelConfig(stem=4, base_channels=96, depth=2)),
        ("base64_d3", ModelConfig(stem=4, base_channels=64, depth=3)),
        # attention-gated family at the serving geometry: is the gate's
        # small-organ localisation prior affordable at serving speed?
        ("att64_d2", ModelConfig(stem=4, base_channels=64, depth=2,
                                 arch="attention_unet")),
    ]
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, size=(BATCH, 512, 512),
                                  dtype=np.uint8))
    results = {}
    for name, cfg in candidates:
        params = jax.jit(model_registry.init, static_argnums=(1,))(
            jax.random.key(0), cfg)
        params = jax.device_put(params)
        pipe = make_pipeline(cfg)
        out = pipe(params, u8)
        int(out[0, 0, 0])  # compile + settle
        out = pipe(params, u8)
        int(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = pipe(params, u8)
        int(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / ITERS
        results[name] = {
            "ms_per_batch128": round(dt * 1e3, 2),
            "slices_per_sec": round(BATCH / dt, 1),
            "params_M": round(n_params(params) / 1e6, 2),
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
