#!/usr/bin/env python
"""Disagreement routing: can a second cheap model catch confidently-wrong
slices that margin routing misses? (ROADMAP r5 #3)

exp_cascade.py measured the honest limitation of confidence routing: the
serving student's crescent worst case is CONFIDENTLY wrong (spearman
margin-vs-IoU = −0.38 on crescents), so it never routes.  Hypothesis under
test here: the specialist and the wide-family robust student (same 3.7 MB
geometry, different training mixture) err DIFFERENTLY, so their pixel
disagreement flags slices where at least one of them is wrong — including
confidently-wrong ones.  Router cost: one extra student pass (~2× student
compute, still ~3600 slices/s equivalent), no teacher in the common path.

Counter-hypothesis (also answerable by this data): both students inherit
the same teacher's soft labels, so their errors are correlated exactly
where capacity binds, and disagreement stays low where both fail.

Protocol mirrors exp_cascade.py: 4 families x n slices; per slice record
(disagreement px count, specialist IoU, teacher IoU); report spearman and
the routing curve (route top-disagreement X% to the teacher).

Usage: python benchmarks/exp_disagree.py [n_per_family] [student_ckpt]
(student_ckpt defaults to the shipped slim4 specialist; pass e.g.
models/flagship_slim5.ckpt to re-tune the routing threshold for a new
serving student — the co-model and fallback stay the shipped ones.)
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    mdir = os.path.join(REPO, "models")

    from unetseg_tpu.ops import decode, preprocess

    s_path = (sys.argv[2] if len(sys.argv) > 2
              else os.path.join(mdir, "flagship_slim4.ckpt"))
    s_params, s_cfg = checkpoint.load(s_path)
    print(f"student: {os.path.basename(s_path)}", flush=True)
    r_params, r_cfg = checkpoint.load(
        os.path.join(mdir, "flagship_slim4_robust.ckpt"))
    # the routing target: the robustified teacher when present (what the
    # serving cascade actually falls back to); regenerable/untracked, so
    # fail with a clear message rather than a bare FileNotFoundError
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

    def fwd(cfg):
        # the SERVING decode (first-num_classes argmax + u8 normalize) —
        # a bare jnp.argmax would diverge from the engine on any head
        # emitting extra channels (round-4 review finding)
        def f(p, u8):
            x = preprocess.model_input_from_u8(u8)[..., None]
            return decode.decode_mask(registry.apply(p, x, cfg),
                                      cfg.num_classes)
        return jax.jit(f)

    s_fwd, r_fwd, t_fwd = fwd(s_cfg), fwd(r_cfg), fwd(t_cfg)

    rows = []  # (family, disagreement, iou_specialist, iou_teacher)
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
            ms, mr, mt = (np.asarray(s_fwd(s_params, b)),
                          np.asarray(r_fwd(r_params, b)),
                          np.asarray(t_fwd(t_params, b)))
            # plain numpy on the already-downloaded masks — re-uploading
            # them for a jitted sum paid 3 extra tunnel round trips/batch
            d = (ms != mr).reshape(ms.shape[0], -1).sum(axis=1)
            for j in range(ms.shape[0]):
                rows.append((fam, int(d[j]),
                             float(metrics.foreground_iou(ms[j], labs[i + j])),
                             float(metrics.foreground_iou(mt[j], labs[i + j]))))

    spearman = metrics.spearman  # tie-corrected, single-sourced

    print("\nper-family: disagreement(specialist, robust) vs specialist IoU")
    for fam in ("standard", "crescent", "lobulated", "illum"):
        sel = [r for r in rows if r[0] == fam]
        ds = np.array([r[1] for r in sel], np.float64)
        ious = np.array([r[2] for r in sel])
        print(f"  {fam:10s} iou min {ious.min():.5f} | disagree px "
              f"mean {ds.mean():7.1f} max {ds.max():7.0f} "
              f"| spearman(d, iou) {spearman(ds, ious):+.3f}")

    alld = np.array([r[1] for r in rows], np.float64)
    alls = np.array([r[2] for r in rows])
    allt = np.array([r[3] for r in rows])
    print(f"\npooled spearman(disagreement, iou) = {spearman(alld, alls):+.3f}"
          f" (n={len(rows)}; negative = high disagreement marks bad slices)")

    order = np.argsort(-alld)  # most-disagreeing first
    print("\nrouting most-disagreeing X% to teacher "
          "(thr_px = route slices with disagreement > thr):")
    for frac in (0.0, 0.05, 0.10, 0.15, 0.20, 0.30):
        k = int(len(rows) * frac)
        routed = alls.copy()
        routed[order[:k]] = allt[order[:k]]
        # the engine threshold that realizes this budget on this pool:
        # route iff disagreement > thr  ->  thr just below the k-th value
        thr = int(alld[order[k - 1]]) - 1 if k else int(alld.max())
        print(f"  route {int(frac*100):3d}% (thr_px {thr:6d}) -> pooled min "
              f"{routed.min():.5f} mean {routed.mean():.5f}")
    # where does the specialist's worst slice rank by disagreement?
    worst = int(np.argmin(alls))
    rank = int(np.nonzero(order == worst)[0][0])
    print(f"\nspecialist worst slice (iou {alls[worst]:.5f}, "
          f"{rows[worst][0]}): disagreement rank {rank + 1}/{len(rows)}")


if __name__ == "__main__":
    main()
