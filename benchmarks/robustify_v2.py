#!/usr/bin/env python
"""Routing-target robustification: raise the cascade fallback's ceiling.

RESULTS_r5 §3's honest residual: the disagree router lifts the pooled
per-slice minimum to 0.99706 at 10% budget, but "route to teacher" cannot
exceed the teacher's own held-out-crescent floor (fg-IoU min 0.98491).
The four round-5 student-side mixture candidates (slim5b/4b/4c/4d) all
REJECTED — at student capacity the mixture trades against the standard/OOD
margin.  The remaining lever is the ROUTING TARGET: 31 M params, no such
capacity bind measured (robustify held every family at 0.999+ except the
family it never saw).

Design, with the held-out bookkeeping disclosed up front:

* fine-tune a COPY of the regenerated teacher (models/flagship_synth.ckpt
  is untouched — it stays the distillation lineage anchor for the shipped
  students) on 40% standard / 20% lobulated / 20% illum / 20% CRESCENT;
* MULTIORGAN becomes the one surviving held-out probe for the routing
  experiment (crescent graduates from probe to training family — for a
  production fallback that is the normal move once a failure mode is
  characterized; the generalization claim now rests on multiorgan);
* saved as models/flagship_synth_robust.ckpt — the pre-wired
  routing-target slot that exp_disagree.py / eval_shift.py already prefer
  when present;
* gate: bench-991 min must stay >= 0.999 (in-family regression guard) and
  crescent min must clear the old 0.98491 floor by a decade
  (>= 0.995) for the re-routed curve to be worth re-measuring.

The reference ships exactly one engine and no fallback tier
(/root/reference/src/initialize.cpp:48-60); cascade serving is this
framework's extension, so the artifact is opt-in like the cascade itself.

Usage: python benchmarks/robustify_v2.py [steps]   (default 3000)
"""

import os
import shutil
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEACHER = os.path.join(REPO, "models", "flagship_synth.ckpt")
OUT = os.path.join(REPO, "models", "flagship_synth_robust.ckpt")


def gen_mixture_v2(rng, n):
    """u8 + labels: 40% standard / 20% lobulated / 20% illum / 20% crescent.
    Multiorgan is deliberately absent — the surviving held-out probe."""
    from unetseg_tpu import data
    from unetseg_tpu.io import native

    imgs = np.empty((n, 512, 512), np.uint8)
    labels = np.empty((n, 512, 512), np.uint8)
    for i in range(n):
        u = rng.random()
        if u < 0.4:
            raw, lab = data.synth_slice(rng, 512, r_range=(0.08, 0.3))
        elif u < 0.6:
            raw, lab = data.synth_slice_shifted(rng, 512, "lobulated")
        elif u < 0.8:
            raw, lab = data.synth_slice_shifted(rng, 512, "illum")
        else:
            raw, lab = data.synth_slice_shifted(rng, 512, "crescent")
        imgs[i] = native.preprocess_u8(raw, 512)
        labels[i] = lab
    return imgs, labels


def eval_report(params, cfg, tag):
    """Like robustify.eval_report but with multiorgan (the v2 probe)."""
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import data, metrics
    from unetseg_tpu.io import native
    from unetseg_tpu.models import registry
    from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

    fpred = jax.jit(lambda p, u8: jnp.argmax(
        registry.apply(p, u8.astype(jnp.float32)[..., None] / 255.0, cfg),
        axis=-1).astype(jnp.uint8))

    mins = {}

    def run(u8, labels, name):
        preds = np.concatenate([
            np.asarray(fpred(params, jnp.asarray(u8[i:i + 16])))
            for i in range(0, len(u8), 16)])
        ious = [float(metrics.foreground_iou(preds[i], labels[i]))
                for i in range(len(labels))]
        mins[name] = float(np.min(ious))
        print(f"[{tag}] {name:12s} mean {np.mean(ious):.5f} "
              f"min {np.min(ious):.5f}", flush=True)

    vrng = np.random.default_rng(991)
    raws, labels = data.synth_batch(vrng, 32)
    u8 = np.stack([preprocess_oracle_u8(r, 512) for r in raws])
    run(u8, labels, "bench-991")
    for kind in ("lobulated", "illum", "crescent", "multiorgan"):
        krng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31)
        raws = np.empty((24, 512, 512), np.uint16)
        labs = np.empty((24, 512, 512), np.uint8)
        for i in range(24):
            raws[i], labs[i] = data.synth_slice_shifted(krng, 512, kind)
        u8 = np.stack([native.preprocess_u8(r, 512) for r in raws])
        run(u8, labs, kind)
    return mins


def main(steps):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, train

    params0, serve_cfg = checkpoint.load(TEACHER)
    cfg = dataclasses.replace(serve_cfg, remat=True)
    tx = train.make_optimizer(lr=1e-4, total_steps=steps)
    params_f32 = jax.device_put(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params0))
    state = train.TrainState(
        params_f32, tx.init(params_f32), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(778)
    t0 = time.time()
    imgs_h, labels_h = gen_mixture_v2(rng, 384)
    print(f"data gen: {time.time()-t0:.1f}s", flush=True)
    imgs, labels = jax.device_put(imgs_h), jax.device_put(labels_h)

    def step_fn(state, idx, imgs, labels):
        bi = jnp.take(imgs, idx, 0).astype(jnp.float32)[..., None] / 255.0
        bl = jnp.take(labels, idx, 0).astype(jnp.int32)
        return train.train_step(state, (bi, bl), cfg=cfg, tx=tx,
                                boundary_boost=8.0)

    step_jit = jax.jit(step_fn, donate_argnums=(0,))
    order = np.arange(384)
    t0 = time.time()
    for s in range(steps):
        if (s * 8) % 384 == 0:
            rng.shuffle(order)
        idx = jnp.asarray(order[(s * 8) % 384:(s * 8) % 384 + 8])
        state, loss = step_jit(state, idx, imgs, labels)
        if s % 200 == 0 or s == steps - 1:
            print(f"step {s:4d} loss {float(loss):.4f} "
                  f"({(time.time()-t0)/(s+1)*1e3:.0f} ms/step)", flush=True)

    mins = eval_report(state.params, serve_cfg, "teacher_v2")
    ok = mins["bench-991"] >= 0.999 and mins["crescent"] >= 0.995
    if not ok:
        print(f"GATE FAILED (bench-991 {mins['bench-991']:.5f} >= 0.999, "
              f"crescent {mins['crescent']:.5f} >= 0.995) — not saving")
        return 3
    if os.path.exists(OUT):
        shutil.copy2(OUT, OUT + ".bak")
    p16 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16), jax.device_get(state.params))
    checkpoint.save(OUT, p16, serve_cfg)
    print(f"saved {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000))
