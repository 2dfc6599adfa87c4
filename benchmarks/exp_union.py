#!/usr/bin/env python
"""Union router tail-catch: does margin-OR-disagreement beat either alone?

exp_cascade.py and exp_disagree.py established that the two router signals
catch DIFFERENT tail types on the shipped student:

  margin      — illumination-type uncertainty (spearman +0.77 on illum)
                but blind to confidently-wrong concave slices (−0.38)
  disagreement— concave capacity failures (specialist-vs-robust mismatch)

This experiment scores the three routing policies on the SAME slice pool
(4 families x n, seeds identical to exp_cascade/exp_disagree) at matched
routing budgets: for budget X%, margin-only routes its bottom X%,
disagree-only routes its top X%, and the union routes bottom X/2% by
margin OR top X/2% by disagreement (actual fraction reported — overlap
makes it <= X).  Routed slices get the teacher's mask.  The metric is the
pooled post-routing IoU minimum — the number the per-slice gate cares
about.

Usage: python benchmarks/exp_union.py [n_per_family]
"""

import zlib
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, data, metrics
    from unetseg_tpu.io import native
    from unetseg_tpu.models import registry
    from unetseg_tpu.ops import confidence, decode

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    mdir = os.path.join(REPO, "models")

    s_params, s_cfg = checkpoint.load(os.path.join(mdir, "flagship_slim4.ckpt"))
    r_params, r_cfg = checkpoint.load(
        os.path.join(mdir, "flagship_slim4_robust.ckpt"))
    # routing target: robustified teacher when present (= serving cascade
    # fallback); regenerable/untracked — fail with a clear message
    t_path = None
    for cand in ("flagship_synth_robust.ckpt", "flagship_synth.ckpt"):
        p = os.path.join(mdir, cand)
        if os.path.exists(p):
            t_path = p
            break
    if t_path is None:
        print("no teacher checkpoint (regenerable; run "
              "benchmarks/train_flagship.py) — cannot measure routing")
        return 1
    t_params, t_cfg = checkpoint.load(t_path)
    s_params, r_params, t_params = map(jax.device_put,
                                       (s_params, r_params, t_params))

    @jax.jit
    def student_stats(p, pr, u8):
        """One program: student mask + margin + disagreement (engine parity)."""
        x = u8.astype(jnp.float32)[..., None] / 255.0
        logits = registry.apply(p, x, s_cfg)
        ms = decode.decode_mask(logits, s_cfg.num_classes)
        margin = confidence.boundary_margin(logits, ms)
        mr = decode.decode_mask(registry.apply(pr, x, r_cfg), r_cfg.num_classes)
        d = jnp.sum((ms != mr).reshape(ms.shape[0], -1),
                    axis=1).astype(jnp.float32)
        return ms, margin, d

    @jax.jit
    def teacher_fwd(p, u8):
        x = u8.astype(jnp.float32)[..., None] / 255.0
        return decode.decode_mask(registry.apply(p, x, t_cfg),
                                  t_cfg.num_classes)

    rows = []  # (family, margin, disagreement, iou_student, iou_teacher)
    for fam in ("standard", "crescent", "lobulated", "illum"):
        rng = np.random.default_rng(zlib.crc32(fam.encode()) % 2**31 + 13)  # = exp_cascade
        u8 = np.empty((n, 512, 512), np.uint8)
        labs = np.empty((n, 512, 512), np.uint8)
        for i in range(n):
            if fam == "standard":
                raw, lab = data.synth_slice(rng, 512, r_range=(0.06, 0.3))
            else:
                raw, lab = data.synth_slice_shifted(rng, 512, fam)
            u8[i] = native.preprocess_u8(raw, 512)
            labs[i] = lab
        for i in range(0, n, 8):
            b = jnp.asarray(u8[i:i + 8])
            ms, mg, d = student_stats(s_params, r_params, b)
            mt = np.asarray(teacher_fwd(t_params, b))
            ms, mg, d = np.asarray(ms), np.asarray(mg), np.asarray(d)
            for j in range(ms.shape[0]):
                rows.append((fam, float(mg[j]), float(d[j]),
                             float(metrics.foreground_iou(ms[j], labs[i + j])),
                             float(metrics.foreground_iou(mt[j], labs[i + j]))))

    mg = np.array([r[1] for r in rows])
    d = np.array([r[2] for r in rows])
    ious = np.array([r[3] for r in rows])
    iout = np.array([r[4] for r in rows])
    N = len(rows)
    print(f"pool: {N} slices, student min {ious.min():.5f} "
          f"mean {ious.mean():.5f}; teacher min {iout.min():.5f}")

    def score(routed_idx):
        out = ious.copy()
        out[routed_idx] = iout[routed_idx]
        return out

    print("\nbudget | margin-only          | disagree-only        | "
          "union (X/2 each)")
    for frac in (0.05, 0.10, 0.20, 0.30):
        k = int(N * frac)
        m_idx = np.argsort(mg)[:k]            # lowest margin
        d_idx = np.argsort(-d)[:k]            # highest disagreement
        # matched budget: the union's two signals SPLIT the same k (k//2 +
        # k-k//2, no forced minimum) — max(1, k//2) let the union route
        # slices the solo policies' k=0/odd-k budgets could not, winning
        # by construction instead of measurement (round-4 review finding)
        u_idx = np.union1d(np.argsort(mg)[:k // 2],
                           np.argsort(-d)[:k - k // 2])
        sm, sd, su = score(m_idx), score(d_idx), score(u_idx)
        print(f"  {int(frac*100):3d}% | min {sm.min():.5f} mean {sm.mean():.5f}"
              f" | min {sd.min():.5f} mean {sd.mean():.5f}"
              f" | min {su.min():.5f} mean {su.mean():.5f}"
              f" ({100*u_idx.size/N:.0f}% routed)")

    # per-family worst slice: which policy at 10% budget catches it?
    print("\nper-family worst slice caught at 10% budget "
          "(m=margin, d=disagree, u=union):")
    k = int(N * 0.10)
    m_set = set(np.argsort(mg)[:k].tolist())
    d_set = set(np.argsort(-d)[:k].tolist())
    u_set = set(np.argsort(mg)[:k // 2].tolist()) | \
        set(np.argsort(-d)[:k - k // 2].tolist())
    fams = np.array([r[0] for r in rows])
    for fam in ("standard", "crescent", "lobulated", "illum"):
        sel = np.nonzero(fams == fam)[0]
        w = sel[np.argmin(ious[sel])]
        tags = "".join(t for t, s in (("m", m_set), ("d", d_set),
                                      ("u", u_set)) if int(w) in s)
        print(f"  {fam:10s} worst iou {ious[w]:.5f} -> caught by: "
              f"{tags or 'NONE'}")


if __name__ == "__main__":
    main()
