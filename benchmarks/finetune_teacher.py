#!/usr/bin/env python
"""Boundary-weighted fine-tune of the flagship teacher (VERDICT r3 item 1).

Round-3 measurement: the teacher ITSELF is the worst-slice ceiling — its own
minimum fg-IoU on the bench held-out set is 0.9981 (slice 12, a small organ),
below the 0.999 per-slice contract the serving student is graded against.
Distilling harder toward the teacher cannot close a gap the teacher owns, so
round 4 first lifts the teacher's tail:

* loss re-weighted onto label-transition bands (train.boundary_weight_map) —
  worst slices lose IoU on the rim of small structures, ~1% of pixels;
* training distribution widened to smaller organs (data.synth_slice r_range
  down to 0.06·S vs the evaluation distribution's 0.12·S floor) so the tail
  of the eval distribution sits in the BULK of the training distribution;
* fresh data (the round-3 teacher trained on 128 slices; this run sees 256
  new ones), low LR, cosine decay.

The evaluation distribution is untouched: held-out seeds 1234/991 with the
default r_range, exactly what bench.py grades.

Usage: python benchmarks/finetune_teacher.py [steps] [n_train] [boost] [lr]
Writes models/flagship_synth.ckpt in place (previous file moved to .bak).
"""

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "models", "flagship_synth.ckpt")


def gen_u8(rng, n, r_range):
    from unetseg_tpu import data
    from unetseg_tpu.io import native

    imgs = np.empty((n, 512, 512), np.uint8)
    labels = np.empty((n, 512, 512), np.uint8)
    for i in range(n):
        raw, lab = data.synth_slice(rng, 512, r_range=r_range)
        imgs[i] = native.preprocess_u8(raw, 512)  # bit-exact C++ fast path
        labels[i] = lab
    return imgs, labels


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, metrics, train
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import registry as model_registry

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    boost = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-4
    batch = 8

    import dataclasses

    params0, serve_cfg = checkpoint.load(CKPT)
    cfg = dataclasses.replace(serve_cfg, remat=True)
    tx = train.make_optimizer(lr=lr, total_steps=steps)
    params_f32 = jax.device_put(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params0))
    state = train.TrainState(
        params_f32, tx.init(params_f32), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(4042)
    t0 = time.time()
    # half standard evaluation range, half wide (small-organ tail coverage)
    i1, l1 = gen_u8(rng, n_train // 2, (0.12, 0.3))
    i2, l2 = gen_u8(rng, n_train - n_train // 2, (0.06, 0.3))
    imgs_h = np.concatenate([i1, i2])
    labels_h = np.concatenate([l1, l2])
    print(f"data gen: {time.time()-t0:.1f}s for {n_train} slices", flush=True)

    imgs = jax.device_put(imgs_h)     # u8, device-resident (tunnel H2D once)
    labels = jax.device_put(labels_h)

    def step_fn(state, idx, imgs, labels):
        bi = jnp.take(imgs, idx, axis=0).astype(jnp.float32)[..., None] / 255.0
        bl = jnp.take(labels, idx, axis=0).astype(jnp.int32)
        return train.train_step(state, (bi, bl), cfg=cfg, tx=tx,
                                boundary_boost=boost)

    step_jit = jax.jit(step_fn, donate_argnums=(0,))

    order = np.arange(n_train)
    t0 = time.time()
    for s in range(steps):
        if (s * batch) % n_train == 0:
            rng.shuffle(order)
        idx = jnp.asarray(order[(s * batch) % n_train:(s * batch) % n_train + batch])
        state, loss = step_jit(state, idx, imgs, labels)
        if s % 200 == 0 or s == steps - 1:
            print(f"step {s:4d} loss {float(loss):.4f} "
                  f"({(time.time()-t0)/(s+1)*1e3:.0f} ms/step)", flush=True)

    # --- held-out eval on the EVALUATION distribution ----------------------
    def evaluate(params, seed, n):
        vrng = np.random.default_rng(seed)
        vi, vl = gen_u8(vrng, n, (0.12, 0.3))
        # match bench.py's preprocessing stream exactly for seed 991
        fpred = jax.jit(lambda p, u8: jnp.argmax(
            model_registry.apply(
                p, u8.astype(jnp.float32)[..., None] / 255.0, serve_cfg),
            axis=-1).astype(jnp.uint8))
        ious = []
        for i in range(0, n, 16):
            pred = np.asarray(fpred(params, jnp.asarray(vi[i:i + 16])))
            ious += [float(metrics.foreground_iou(pred[k], vl[i + k]))
                     for k in range(pred.shape[0])]
        return float(np.mean(ious)), float(np.min(ious))

    # NB: eval uses native.preprocess_u8 while bench uses the NumPy oracle —
    # the two are differential-tested bit-identical (tests/test_preprocess.py)
    for seed, n in ((1234, 64), (7171, 64)):
        m, mn = evaluate(state.params, seed, n)
        print(f"val seed {seed}: fg IoU mean {m:.5f} min {mn:.5f}", flush=True)

    # bench's own val: data.synth_batch(991) -> oracle path
    from unetseg_tpu import data as _data
    from unetseg_tpu.ops import preprocess as _pp

    vrng = np.random.default_rng(991)
    raws, vl = _data.synth_batch(vrng, 32)
    u8v = np.stack([_pp.preprocess_oracle_u8(r, 512) for r in raws])
    fpred = jax.jit(lambda p, u8: jnp.argmax(
        model_registry.apply(
            p, u8.astype(jnp.float32)[..., None] / 255.0, serve_cfg),
        axis=-1).astype(jnp.uint8))
    pred = np.asarray(fpred(state.params, jnp.asarray(u8v)))
    ious = [float(metrics.foreground_iou(pred[i], vl[i])) for i in range(32)]
    print(f"bench val 991: mean {np.mean(ious):.5f} min {np.min(ious):.5f}",
          flush=True)

    shutil.copy2(CKPT, CKPT + ".bak")
    params_f16 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16), jax.device_get(state.params))
    checkpoint.save(CKPT, params_f16, serve_cfg)
    print(f"saved {CKPT} ({os.path.getsize(CKPT)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
