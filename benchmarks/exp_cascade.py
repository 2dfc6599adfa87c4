#!/usr/bin/env python
"""Router-signal validation for confidence-cascade serving (ROADMAP r5 #5).

Question: can a cheap ON-DEVICE statistic of the d2 student's own logits
identify the slices where it underperforms (concave crescents, worst-case
organs), so they can be re-run through a stronger model?

Statistic tested: mean top1-top2 logit margin over the PREDICTED BOUNDARY
BAND (3x3 dilation XOR erosion of the argmax mask).  The worst slices are
boundary-precision failures — small organs and concave rims — so a global
margin mean would wash out; the band restricts it to the pixels that decide
fg-IoU.  Cost: one extra top-2 + maxpool over the logits already produced,
fused into the serving executable (no extra model pass, no extra D2H beyond
one scalar per slice).

Protocol: for each family (standard r_range floor, crescent held-out,
lobulated, illum), run the student, record (margin, fg-IoU) per slice, then
report the rank correlation and — the deployment question — the IoU floor
when the lowest-confidence X% of slices are routed to a fallback model
(teacher, and the d3 gen-1 student when present).

Usage: python benchmarks/exp_cascade.py [n_per_family]
"""

import zlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, data, metrics
    from unetseg_tpu.io import native
    from unetseg_tpu.models import registry
    from unetseg_tpu.ops import confidence

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    mdir = os.path.join(REPO, "models")
    student_path = next(p for p in (
        os.path.join(mdir, "flagship_slim4.ckpt"),
        os.path.join(mdir, "flagship_slim4_robust.ckpt")) if os.path.exists(p))
    s_params, s_cfg = checkpoint.load(student_path)
    s_params = jax.device_put(s_params)
    print(f"student: {os.path.basename(student_path)}")

    fallbacks = {}
    for name, fname in (("teacher", "flagship_synth.ckpt"),
                        ("robust-d2", "flagship_slim4_robust.ckpt"),
                        ("d3-gen1", "flagship_slim.ckpt")):
        p = os.path.join(mdir, fname)
        if os.path.exists(p):
            fp, fc = checkpoint.load(p)
            fallbacks[name] = (jax.device_put(fp), fc)
    print(f"fallbacks: {list(fallbacks)}")

    @jax.jit
    def student_fwd(p, u8):
        x = u8.astype(jnp.float32)[..., None] / 255.0
        logits = registry.apply(p, x, s_cfg)
        mask = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        conf = confidence.boundary_margin(logits, mask)
        return mask, conf

    def fb_fwd(fb_cfg):
        def f(p, u8):
            x = u8.astype(jnp.float32)[..., None] / 255.0
            return jnp.argmax(registry.apply(p, x, fb_cfg),
                              axis=-1).astype(jnp.uint8)
        return jax.jit(f)

    fb_jits = {k: fb_fwd(c) for k, (_, c) in fallbacks.items()}

    families = ("standard", "crescent", "lobulated", "illum")
    rows = []  # (family, i, conf, iou_student, {fb: iou})
    for fam in families:
        rng = np.random.default_rng(zlib.crc32(fam.encode()) % 2**31 + 13)
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
            m, c = student_fwd(s_params, jnp.asarray(u8[i:i + 8]))
            m, c = np.asarray(m), np.asarray(c)
            fbm = {k: np.asarray(fb_jits[k](fallbacks[k][0],
                                            jnp.asarray(u8[i:i + 8])))
                   for k in fallbacks}
            for j in range(m.shape[0]):
                iou_s = float(metrics.foreground_iou(m[j], labs[i + j]))
                ious_f = {k: float(metrics.foreground_iou(fbm[k][j],
                                                          labs[i + j]))
                          for k in fallbacks}
                rows.append((fam, i + j, float(c[j]), iou_s, ious_f))

    # -- report ------------------------------------------------------------
    spearman = metrics.spearman  # tie-corrected, single-sourced

    print("\nper-family: conf vs student fg-IoU")
    for fam in families:
        sel = [r for r in rows if r[0] == fam]
        confs = np.array([r[2] for r in sel])
        ious = np.array([r[3] for r in sel])
        print(f"  {fam:10s} iou mean {ious.mean():.5f} min {ious.min():.5f} "
              f"| conf mean {confs.mean():.3f} min {confs.min():.3f} "
              f"| spearman {spearman(confs, ious):+.3f}")

    allc = np.array([r[2] for r in rows])
    alls = np.array([r[3] for r in rows])
    print(f"\npooled spearman(conf, iou) = {spearman(allc, alls):+.3f} "
          f"(n={len(rows)})")

    # routing curve: route lowest-conf X% to each fallback
    order = np.argsort(allc)
    for fb in fallbacks:
        allf = np.array([r[4][fb] for r in rows])
        print(f"\nrouting to {fb}:")
        for frac in (0.0, 0.05, 0.10, 0.20, 0.30):
            k = int(len(rows) * frac)
            routed = alls.copy()
            routed[order[:k]] = allf[order[:k]]
            # did routing help or hurt the routed slices?
            print(f"  route {int(frac*100):3d}% -> pooled min {routed.min():.5f} "
                  f"mean {routed.mean():.5f} "
                  f"(student-only min {alls.min():.5f})")

    # oracle ceiling: always pick the better of student/fallback
    for fb in fallbacks:
        allf = np.array([r[4][fb] for r in rows])
        print(f"oracle(best-of student,{fb}): min {np.maximum(alls, allf).min():.5f}"
              f" | {fb}-only min {allf.min():.5f}")


if __name__ == "__main__":
    main()
