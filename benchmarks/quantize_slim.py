#!/usr/bin/env python
"""Quantize the serving checkpoints to w8a8 and measure the int8 question.

VERDICT r2 item 1 asked for int8 operands through the serving path with a
written account.  This script produces the artifacts and the numbers:

* calibrates + quantizes models/flagship_slim.ckpt (and, when present, the
  512² flagship) via unetseg_tpu/quantize.py,
* measures batch-32 device throughput of the w8a8 forward vs the f32/bf16
  forward for both geometries,
* measures mask agreement and fg IoU of the quantized model,
* writes models/flagship_slim_w8a8.ckpt (servable: engine init on it works).

Usage: python benchmarks/quantize_slim.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, data, metrics, quantize
    from unetseg_tpu.models import registry as model_registry
    from unetseg_tpu.ops import preprocess

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    report = {"device": str(jax.devices()[0]), "batch": batch}

    def sync(x):
        return int(jax.device_get(x.reshape(-1)[:1])[0] != 12345)

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(77)

    def calib_batches():
        for _ in range(2):
            imgs, _ = data.training_batch(rng, 8)
            yield imgs

    vrng = np.random.default_rng(991)
    raws, labels = data.synth_batch(vrng, 16)
    u8v = np.stack([preprocess.preprocess_oracle_u8(r, 512) for r in raws])
    xv = (u8v.astype(np.float32) / 255.0)[..., None]

    for name, ckpt in [("slim4", "models/flagship_slim4.ckpt"),
                       ("slim", "models/flagship_slim.ckpt"),
                       ("flagship", "models/flagship_synth.ckpt")]:
        src = os.path.join(REPO, ckpt)
        if not os.path.exists(src):
            continue
        dst = src.replace(".ckpt", "_w8a8.ckpt")
        q, qcfg = quantize.quantize_checkpoint(src, dst, calib_batches())
        params, cfg = checkpoint.load(src)
        params = jax.device_put(params)
        q = jax.device_put(q)

        def f32_fwd(p, x, c=cfg):
            return jnp.argmax(model_registry.apply(p, x, c), -1).astype(jnp.uint8)

        def q_fwd(p, x, c=qcfg):
            return jnp.argmax(model_registry.apply(p, x, c), -1).astype(jnp.uint8)

        f32_j = jax.jit(f32_fwd)
        q_j = jax.jit(q_fwd)
        xb = jnp.asarray(np.repeat(xv[:1], batch, axis=0))

        t_f = timeit(f32_j, params, xb)
        t_q = timeit(q_j, q, xb)

        m_f = np.asarray(f32_j(params, jnp.asarray(xv)))
        m_q = np.asarray(q_j(q, jnp.asarray(xv)))
        agree = float(np.mean([
            metrics.foreground_iou(m_q[i], m_f[i]) for i in range(len(m_f))]))
        fg = float(np.mean([
            metrics.foreground_iou(m_q[i], labels[i]) for i in range(len(m_f))]))
        report[name] = {
            "f32_ms_per_batch": round(t_f * 1e3, 1),
            "w8a8_ms_per_batch": round(t_q * 1e3, 1),
            "speedup": round(t_f / t_q, 3),
            "mask_agreement_fg_iou": round(agree, 5),
            "fg_iou_vs_labels": round(fg, 5),
            "ckpt_mb": round(os.path.getsize(dst) / 1e6, 1),
        }
        print(name, report[name], flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
