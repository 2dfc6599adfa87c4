#!/usr/bin/env python
"""Distill the slim flagship (s2d2 stem, 1110 slices/s measured) from the
512² flagship teacher (VERDICT r2 item 2).

The serving contract fixes only the I/O (1x512x512 u8 in -> 3-class mask,
/root/reference/src/process.cpp:70,162); the internals are free.  The slim
variant moves every internal tensor to 256² (ModelConfig(stem=2)) — the
measured HBM-bandwidth bottleneck was the 512² levels — and is trained here
with hard labels + KL distillation against models/flagship_synth.ckpt so its
masks agree with the teacher's to >=0.999 IoU.

Produces ``models/flagship_slim.ckpt`` (float16 params, serve config) and
prints val fg-IoU (vs labels) and mask agreement (vs teacher).

Usage: python benchmarks/train_slim.py [steps] [n_train]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEACHER = os.path.join(REPO, "models", "flagship_synth.ckpt")
OUT = os.path.join(REPO, "models", "flagship_slim.ckpt")


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, data, metrics, train
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import registry as model_registry

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    batch = 8

    t_params, t_cfg = checkpoint.load(TEACHER)
    t_params = jax.device_put(t_params)

    cfg = ModelConfig(stem=2)  # variant D of benchmarks/exp_slim_arch.py
    tx = train.make_optimizer(lr=3e-4, total_steps=steps)
    state = train.init_state(jax.random.key(0), cfg, tx)

    rng = np.random.default_rng(42)
    t0 = time.time()
    imgs, labels = data.training_batch(rng, n_train)
    print(f"data gen: {time.time()-t0:.1f}s for {n_train} slices", flush=True)

    # Precompute teacher logits once (f16 on host: n_train * 3 MB).
    @jax.jit
    def teacher_fwd(p, x):
        return model_registry.apply(p, x, t_cfg)

    t0 = time.time()
    t_logits = np.empty((n_train, 512, 512, 3), np.float16)
    for i in range(0, n_train, 16):
        t_logits[i:i + 16] = np.asarray(
            teacher_fwd(t_params, jnp.asarray(imgs[i:i + 16])), np.float16)
    print(f"teacher logits: {time.time()-t0:.1f}s", flush=True)

    step_fn = jax.jit(
        functools.partial(train.distill_step, cfg=cfg, tx=tx,
                          alpha=0.5, temperature=2.0),
        donate_argnums=(0,),
    )

    order = np.arange(n_train)
    t0 = time.time()
    for s in range(steps):
        if s % (n_train // batch) == 0:
            rng.shuffle(order)
        idx = order[(s * batch) % n_train:(s * batch) % n_train + batch]
        b = (jnp.asarray(imgs[idx]), jnp.asarray(labels[idx]),
             jnp.asarray(t_logits[idx], jnp.float32))
        state, loss = step_fn(state, b)
        if s % 50 == 0 or s == steps - 1:
            print(f"step {s:4d} loss {float(loss):.4f} "
                  f"({(time.time()-t0)/(s+1)*1e3:.0f} ms/step)", flush=True)

    # --- held-out evaluation: fg IoU vs labels, agreement vs teacher -------
    val_rng = np.random.default_rng(1234)
    vi, vl = data.training_batch(val_rng, 32)

    @jax.jit
    def predict(params, x, c):
        return jnp.argmax(model_registry.apply(params, x, c),
                          axis=-1).astype(jnp.uint8)

    predict_s = jax.jit(lambda p, x: jnp.argmax(
        model_registry.apply(p, x, cfg), axis=-1).astype(jnp.uint8))
    predict_t = jax.jit(lambda p, x: jnp.argmax(
        model_registry.apply(p, x, t_cfg), axis=-1).astype(jnp.uint8))

    ps = np.asarray(predict_s(state.params, jnp.asarray(vi)))
    pt = np.asarray(predict_t(t_params, jnp.asarray(vi)))
    fg_iou = float(np.mean([
        metrics.foreground_iou(ps[i], vl[i]) for i in range(len(vl))]))
    agree = float(np.mean([
        metrics.foreground_iou(ps[i], pt[i]) for i in range(len(vl))]))
    pix_agree = float(np.mean(ps == pt))
    print(f"val fg IoU vs labels:   {fg_iou:.5f}")
    print(f"fg IoU vs teacher mask: {agree:.5f}")
    print(f"pixel agreement:        {pix_agree:.6f}")

    params_f16 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16), jax.device_get(state.params))
    checkpoint.save(OUT, params_f16, cfg)
    print(f"saved {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
