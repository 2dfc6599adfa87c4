#!/usr/bin/env python
"""Distill the slim flagship (s2d2 stem, >1200 slices/s measured) from the
512² flagship teacher (VERDICT r2 item 2).

The serving contract fixes only the I/O (1x512x512 u8 in -> 3-class mask,
/root/reference/src/process.cpp:70,162); the internals are free.  The slim
variant moves every internal tensor to 256² (ModelConfig(stem=2)) — the
measured HBM-bandwidth bottleneck was the 512² levels — and is trained here
with hard labels + KL distillation against models/flagship_synth.ckpt so its
masks agree with the teacher's to >=0.999 IoU.

The whole dataset (u8 slices, labels, teacher logits in f16) lives on
device: through the dev tunnel H2D runs at ~0.04 GB/s, so per-step batch
shipping would dominate; instead each jitted step gathers its batch from
device-resident tensors by an 8-int index vector.

Produces ``models/flagship_slim.ckpt`` (float16 params, serve config) and
prints val fg-IoU (vs labels) and mask agreement (vs teacher).

Usage: python benchmarks/train_slim.py [steps] [n_train] [depth] [stem]
                                       [base_channels] [out_path] [boost]
                                       [arch] [mix] [mix_kinds] [mix_mode]
(stem=4 explores the 128²-levels geometry; the contract gate — ship only
at >=0.999 agreement — is applied by the caller.  ``boost`` > 0 enables
boundary-weighted distillation — label-transition pixels up-weighted in CE
and KL (train.boundary_weight_map) — and widens a third of the training
data to smaller organs (data.synth_slice r_range (0.06, 0.3)): the round-4
worst-slice levers, VERDICT r3 item 1.  ``mix`` > 0 draws that fraction of
the pool from the crescent+illum shift families (half each,
data.synth_slice_shifted) — the in-family lever for students whose capacity
is too small for the standard-only robustness transfer (RESULTS_r5 §7:
base48_d2 collapses on illum at 1.06 M params).  ``mix_kinds`` (comma-
separated, default ``crescent,illum``) selects which shift families the mix
draws from; whatever is listed is IN-POOL and no longer a held-out probe —
keep at least one family (lobulated by convention) out.

``mix_mode`` controls WHEN the shift slices are sampled (the round-5
mixture account showed a constant mixture trades ~1.5e-4 of val991 and the
held-out tails no matter which families are in-pool — RESULTS_r5 §8):
  const          (default) shift slices sampled uniformly with the rest of
                 the pool for the whole run — the six-candidate record.
  curr:F:P       curriculum, standard → mixture: the first F·steps sample
                 ONLY the standard segment (formative phase identical to
                 the shipped standard-only recipe), the remaining steps
                 draw each batch element from the shift segment with
                 probability P (total shift exposure = (1−F)·P of samples).
                 Both segments keep epoch-walk coverage (shuffle on wrap).
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


def gen_u8(rng, n, r_range=(0.12, 0.3)):
    """n synthetic slices as serving-distribution u8 + labels."""
    from unetseg_tpu import data
    from unetseg_tpu.io import native

    imgs = np.empty((n, 512, 512), np.uint8)
    labels = np.empty((n, 512, 512), np.uint8)
    for i in range(n):
        raw, lab = data.synth_slice(rng, 512, r_range=r_range)
        imgs[i] = native.preprocess_u8(raw, 512)  # bit-exact C++ fast path
        labels[i] = lab
    return imgs, labels


def gen_shift_u8(rng, n, kinds=("crescent", "illum")):
    """n shift-family slices (round-robin over kinds) as serving u8 + labels."""
    from unetseg_tpu import data
    from unetseg_tpu.io import native

    imgs = np.empty((n, 512, 512), np.uint8)
    labels = np.empty((n, 512, 512), np.uint8)
    for i in range(n):
        raw, lab = data.synth_slice_shifted(rng, 512, kind=kinds[i % len(kinds)])
        imgs[i] = native.preprocess_u8(raw, 512)
        labels[i] = lab
    return imgs, labels


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, metrics, train
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import registry as model_registry

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    stem = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    base = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    out_path = sys.argv[6] if len(sys.argv) > 6 else OUT
    boost = float(sys.argv[7]) if len(sys.argv) > 7 else 0.0
    arch = sys.argv[8] if len(sys.argv) > 8 else "unet"
    mix = float(sys.argv[9]) if len(sys.argv) > 9 else 0.0
    mix_kinds = (tuple(sys.argv[10].split(",")) if len(sys.argv) > 10
                 else ("crescent", "illum"))
    mix_mode = sys.argv[11] if len(sys.argv) > 11 else "const"
    batch = 8

    t_params, t_cfg = checkpoint.load(TEACHER)
    t_params = jax.device_put(t_params)

    cfg = ModelConfig(stem=stem, depth=depth, base_channels=base, arch=arch)
    tx = train.make_optimizer(lr=3e-4, total_steps=steps)
    state = train.init_state(jax.random.key(0), cfg, tx)

    rng = np.random.default_rng(42)
    t0 = time.time()
    n_shift = int(round(n_train * mix))  # crescent+illum in-family slices
    n_std = n_train - n_shift
    if boost > 0:  # worst-slice mode: a third of the standard data from the
        n_wide = n_std // 3            # wide (small-organ) distribution
        i1, l1 = gen_u8(rng, n_std - n_wide)
        i2, l2 = gen_u8(rng, n_wide, r_range=(0.06, 0.3))
        parts = [(i1, l1), (i2, l2)]
    else:
        parts = [gen_u8(rng, n_std)]
    if n_shift > 0:
        parts.append(gen_shift_u8(rng, n_shift, kinds=mix_kinds))
    imgs_h = np.concatenate([p[0] for p in parts])
    labels_h = np.concatenate([p[1] for p in parts])
    print(f"data gen: {time.time()-t0:.1f}s for {n_train} slices", flush=True)

    t0 = time.time()
    imgs = jax.device_put(imgs_h)      # (n, 512, 512) u8, device-resident
    labels = jax.device_put(labels_h)
    print(f"H2D dataset: {time.time()-t0:.1f}s", flush=True)

    # Teacher logits computed and KEPT on device (f16): no tunnel round trip.
    @jax.jit
    def teacher_fwd(p, u8):
        x = u8.astype(jnp.float32)[..., None] / 255.0
        return model_registry.apply(p, x, t_cfg).astype(jnp.bfloat16)

    t0 = time.time()
    t_logits = jnp.concatenate([
        teacher_fwd(t_params, imgs[i:i + 16]) for i in range(0, n_train, 16)
    ])
    _ = int(t_logits[0, 0, 0, 0] != 0)  # sync (block_until_ready unreliable here)
    print(f"teacher logits: {time.time()-t0:.1f}s", flush=True)

    def step_fn(state, idx, imgs, labels, t_logits):
        bi = jnp.take(imgs, idx, axis=0).astype(jnp.float32)[..., None] / 255.0
        bl = jnp.take(labels, idx, axis=0).astype(jnp.int32)
        bt = jnp.take(t_logits, idx, axis=0).astype(jnp.float32)
        return train.distill_step(state, (bi, bl, bt), cfg=cfg, tx=tx,
                                  alpha=0.5, temperature=2.0,
                                  boundary_boost=boost)

    step_jit = jax.jit(step_fn, donate_argnums=(0,))

    class _Walk:
        """Epoch-walk over [lo, hi): uniform coverage, reshuffle on wrap."""

        def __init__(self, lo, hi):
            self.order, self.pos = np.arange(lo, hi), 0
            rng.shuffle(self.order)

        def take(self, k):
            out = []
            while k:
                if self.pos == len(self.order):
                    rng.shuffle(self.order)
                    self.pos = 0
                m = min(k, len(self.order) - self.pos)
                out.append(self.order[self.pos:self.pos + m])
                self.pos += m
                k -= m
            return (np.concatenate(out) if out
                    else np.empty(0, self.order.dtype))

    if mix_mode.startswith("curr") and n_shift > 0:
        _, f_std, p_late = mix_mode.split(":")
        f_std, p_late = float(f_std), float(p_late)
        print(f"curriculum: standard-only for {f_std:.0%} of steps, then "
              f"P(shift)={p_late} (total shift exposure "
              f"{(1 - f_std) * p_late:.1%})", flush=True)
        w_std, w_shift = _Walk(0, n_std), _Walk(n_std, n_train)
        t0 = time.time()
        for s in range(steps):
            k = int(rng.binomial(batch, p_late)) if s >= f_std * steps else 0
            idx = jnp.asarray(np.concatenate(
                [w_shift.take(k), w_std.take(batch - k)]))
            state, loss = step_jit(state, idx, imgs, labels, t_logits)
            if s % 100 == 0 or s == steps - 1:
                print(f"step {s:4d} loss {float(loss):.4f} "
                      f"({(time.time()-t0)/(s+1)*1e3:.0f} ms/step)",
                      flush=True)
    else:
        order = np.arange(n_train)
        t0 = time.time()
        for s in range(steps):
            if (s * batch) % n_train == 0:
                rng.shuffle(order)
            idx = jnp.asarray(order[(s * batch) % n_train:(s * batch) % n_train + batch])
            state, loss = step_jit(state, idx, imgs, labels, t_logits)
            if s % 100 == 0 or s == steps - 1:
                print(f"step {s:4d} loss {float(loss):.4f} "
                      f"({(time.time()-t0)/(s+1)*1e3:.0f} ms/step)", flush=True)

    # --- held-out evaluation: fg IoU vs labels, agreement vs teacher -------
    # Multiple val seeds with MIN reporting: the ship gate is now graded on
    # the per-slice minimum, not just the mean (VERDICT r3 item 1).
    def predict(c):
        @jax.jit
        def f(p, u8):
            x = u8.astype(jnp.float32)[..., None] / 255.0
            return jnp.argmax(model_registry.apply(p, x, c),
                              axis=-1).astype(jnp.uint8)
        return f

    def batched_pred(f, p, u8_h):
        return np.concatenate([
            np.asarray(f(p, jax.device_put(u8_h[i:i + 16])))
            for i in range(0, len(u8_h), 16)])

    fs, ft = predict(cfg), predict(t_cfg)
    for seed, n_val in ((1234, 64), (7171, 64), (991, 32)):
        val_rng = np.random.default_rng(seed)
        if seed == 991:  # bench.py's exact stream: synth_batch + oracle u8
            from unetseg_tpu import data as _data
            from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

            raws, vl_h = _data.synth_batch(val_rng, n_val)
            vi_h = np.stack([preprocess_oracle_u8(r, 512) for r in raws])
        else:
            vi_h, vl_h = gen_u8(val_rng, n_val)
        ps = batched_pred(fs, state.params, vi_h)
        pt = batched_pred(ft, t_params, vi_h)
        li = [float(metrics.foreground_iou(ps[i], vl_h[i]))
              for i in range(len(vl_h))]
        la = [float(metrics.foreground_iou(ps[i], pt[i]))
              for i in range(len(vl_h))]
        print(f"val seed {seed}: fg IoU vs labels mean {np.mean(li):.5f} "
              f"min {np.min(li):.5f} | vs teacher mean {np.mean(la):.5f} "
              f"min {np.min(la):.5f} | pix agree {np.mean(ps == pt):.6f}",
              flush=True)

    params_f16 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16), jax.device_get(state.params))
    checkpoint.save(out_path, params_f16, cfg)
    print(f"saved {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
