#!/usr/bin/env python
"""Routing-target robustification, attempt 2: crescent VARIETY, not steps.

teacher_v2 (robustify_v2.py, queue_logs/teacher_v2.log) showed the 31 M
fallback takes crescent in-family with NO trade anywhere (bench-991 min
0.99995, held-out multiorgan 0.99991) but its worst-of-24 crescent on a
fresh crc32 pool stopped at 0.99209 — short of the pre-registered 0.995
bar — with training loss converged at 1e-4.  That signature is
distribution-tail generalization, not optimization: the 384-slice pool
held only ~77 distinct crescents.

v3 changes exactly two knobs, both toward variety:

* pool 384 -> 768 slices, mixture 35% standard / 15% lobulated /
  15% illum / 35% crescent  (~270 distinct crescents, 3.5x v2);
* 4500 steps (36 000 samples; ~47 visits/slice — v2 gave 62, so
  per-slice exposure goes DOWN while diversity goes up).

Everything else is v2 verbatim (same lr, boundary boost, held-out
multiorgan probe, same pre-registered gate: bench-991 min >= 0.999 AND
crescent min >= 0.995; same save slot models/flagship_synth_robust.ckpt;
the lineage anchor models/flagship_synth.ckpt is untouched).

Usage: python benchmarks/robustify_v3.py [steps]   (default 4500)
"""

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from robustify_v2 import OUT, TEACHER, eval_report  # noqa: E402


def gen_mixture_v3(rng, n):
    """u8 + labels: 35% standard / 15% lobulated / 15% illum / 35% crescent.
    Multiorgan stays the held-out probe (as in v2)."""
    from unetseg_tpu import data
    from unetseg_tpu.io import native

    imgs = np.empty((n, 512, 512), np.uint8)
    labels = np.empty((n, 512, 512), np.uint8)
    for i in range(n):
        u = rng.random()
        if u < 0.35:
            raw, lab = data.synth_slice(rng, 512, r_range=(0.08, 0.3))
        elif u < 0.50:
            raw, lab = data.synth_slice_shifted(rng, 512, "lobulated")
        elif u < 0.65:
            raw, lab = data.synth_slice_shifted(rng, 512, "illum")
        else:
            raw, lab = data.synth_slice_shifted(rng, 512, "crescent")
        imgs[i] = native.preprocess_u8(raw, 512)
        labels[i] = lab
    return imgs, labels


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

    n_pool = 768
    rng = np.random.default_rng(779)
    t0 = time.time()
    imgs_h, labels_h = gen_mixture_v3(rng, n_pool)
    print(f"data gen: {time.time()-t0:.1f}s for {n_pool} slices", flush=True)
    imgs, labels = jax.device_put(imgs_h), jax.device_put(labels_h)

    def step_fn(state, idx, imgs, labels):
        bi = jnp.take(imgs, idx, 0).astype(jnp.float32)[..., None] / 255.0
        bl = jnp.take(labels, idx, 0).astype(jnp.int32)
        return train.train_step(state, (bi, bl), cfg=cfg, tx=tx,
                                boundary_boost=8.0)

    step_jit = jax.jit(step_fn, donate_argnums=(0,))
    order = np.arange(n_pool)
    t0 = time.time()
    for s in range(steps):
        if (s * 8) % n_pool == 0:
            rng.shuffle(order)
        idx = jnp.asarray(order[(s * 8) % n_pool:(s * 8) % n_pool + 8])
        state, loss = step_jit(state, idx, imgs, labels)
        if s % 200 == 0 or s == steps - 1:
            print(f"step {s:4d} loss {float(loss):.4f} "
                  f"({(time.time()-t0)/(s+1)*1e3:.0f} ms/step)", flush=True)

    mins = eval_report(state.params, serve_cfg, "teacher_v3")
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
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 4500))
