#!/usr/bin/env python
"""TTA-self-disagreement routing: a third signal for the agree-while-wrong tail.

RESULTS_r5 §11 closed the teacher side of the routed-serving account: the
pooled post-routing minimum (0.99706 at 10% budget) is ROUTER-limited —
the binding slice is one where specialist and robust co-student agree
while both are wrong, so co-student disagreement never routes it, and a
strictly better fallback (teacher_v3) moved nothing.  §3 already measured
margin and margin∪disagree no better at matched budget.

This experiment measures the one cheap signal not yet tried: the
specialist's OWN instability under a horizontal flip (dihedral k=4, the
product TTA transform from parallel/tta.py).  Per slice:

  d_co  = |mask(x) != mask_co(x)|            (shipped signal, §3)
  d_tta = |mask(x) != flip⁻¹(mask(flip(x)))| (one extra specialist pass —
          same router cost class as d_co: ~2× student compute)

Counter-hypothesis (answerable by this data): capacity failures that the
co-student shares are SYMMETRIC — the flipped view fails the same way, so
d_tta is low exactly where d_co is low and the union buys nothing.

Policies at matched budget X% (union convention = exp_union.py): co-only
(top X by d_co; reproduces §3), tta-only (top X by d_tta), union (top X/2
by each, actual fraction reported).  Routed slices get the teacher mask.
Metric: pooled post-routing IoU minimum.

Pre-registered adoption bar: a policy ships (new engine router mode) only
if its pooled min at ≤10% ACTUAL budget exceeds the committed 0.99706 on
this pool (crc32 seeds, identical to exp_cascade/exp_disagree/exp_union).

Usage: python benchmarks/exp_tta_route.py [n_per_family]
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
    from unetseg_tpu.ops import decode, preprocess

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
    print(f"teacher: {os.path.basename(t_path)}", flush=True)
    s_params, r_params, t_params = map(jax.device_put,
                                       (s_params, r_params, t_params))

    def fwd(cfg):
        def f(p, u8):
            x = preprocess.model_input_from_u8(u8)[..., None]
            return decode.decode_mask(registry.apply(p, x, cfg),
                                      cfg.num_classes)
        return jax.jit(f)

    s_fwd, r_fwd, t_fwd = fwd(s_cfg), fwd(r_cfg), fwd(t_cfg)

    rows = []  # (family, d_co, d_tta, iou_specialist, iou_teacher)
    for fam in ("standard", "crescent", "lobulated", "illum"):
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
            b = jnp.asarray(u8[i:i + 8])
            # horizontal flip on the HOST u8 (axis 2 = width) — the same
            # dihedral k=4 view parallel/tta.py uses; flipping the u8 is
            # exact (preprocess is per-pixel), so flip⁻¹(mask) compares
            # apples to apples with the unflipped mask
            bf = jnp.asarray(u8[i:i + 8, :, ::-1])
            ms = np.asarray(s_fwd(s_params, b))
            msf = np.asarray(s_fwd(s_params, bf))[:, :, ::-1]
            mr = np.asarray(r_fwd(r_params, b))
            mt = np.asarray(t_fwd(t_params, b))
            d_co = (ms != mr).reshape(ms.shape[0], -1).sum(axis=1)
            d_tta = (ms != msf).reshape(ms.shape[0], -1).sum(axis=1)
            for j in range(ms.shape[0]):
                rows.append((fam, int(d_co[j]), int(d_tta[j]),
                             float(metrics.foreground_iou(ms[j], labs[i + j])),
                             float(metrics.foreground_iou(mt[j], labs[i + j]))))

    spearman = metrics.spearman

    print("\nper-family: signals vs specialist IoU")
    for fam in ("standard", "crescent", "lobulated", "illum"):
        sel = [r for r in rows if r[0] == fam]
        dco = np.array([r[1] for r in sel], np.float64)
        dtt = np.array([r[2] for r in sel], np.float64)
        ious = np.array([r[3] for r in sel])
        print(f"  {fam:10s} iou min {ious.min():.5f} | d_co mean "
              f"{dco.mean():7.1f} sp {spearman(dco, ious):+.3f} | d_tta mean "
              f"{dtt.mean():7.1f} sp {spearman(dtt, ious):+.3f}")

    dco = np.array([r[1] for r in rows], np.float64)
    dtt = np.array([r[2] for r in rows], np.float64)
    alls = np.array([r[3] for r in rows])
    allt = np.array([r[4] for r in rows])
    print(f"\npooled spearman: d_co {spearman(dco, alls):+.3f}   "
          f"d_tta {spearman(dtt, alls):+.3f}   (n={len(rows)})")

    oc = np.argsort(-dco)
    ot = np.argsort(-dtt)

    def routed_min(idx):
        routed = alls.copy()
        routed[idx] = allt[idx]
        return routed.min(), routed.mean()

    print("\nmatched-budget routing (pooled post-routing min / mean):")
    print("  budget |        co-only       |       tta-only       |"
          "    union (actual%)")
    for frac in (0.05, 0.10, 0.15, 0.20, 0.30):
        k = int(len(rows) * frac)
        h = max(k // 2, 1)
        uni = np.unique(np.concatenate([oc[:h], ot[:h]]))
        mc, ac = routed_min(oc[:k])
        mtta, atta = routed_min(ot[:k])
        mu, au = routed_min(uni)
        print(f"  {int(frac*100):4d}%  | {mc:.5f} {ac:.5f}      "
              f"| {mtta:.5f} {atta:.5f}      "
              f"| {mu:.5f} {au:.5f} ({100 * len(uni) / len(rows):.1f}%)")

    # the §11 question, answered directly: where do the binding
    # (worst non-routed-at-10%-co) slices rank under d_tta?
    k10 = int(len(rows) * 0.10)
    nonrouted = np.setdiff1d(np.arange(len(rows)), oc[:k10])
    worst_nr = nonrouted[np.argsort(alls[nonrouted])[:3]]
    print("\nworst 3 slices NOT routed by co-signal at 10%:")
    for w in worst_nr:
        rk_t = int(np.nonzero(ot == w)[0][0]) + 1
        rk_c = int(np.nonzero(oc == w)[0][0]) + 1
        print(f"  {rows[w][0]:10s} iou {alls[w]:.5f} | d_co {int(dco[w]):5d}"
              f" (rank {rk_c:2d}) | d_tta {int(dtt[w]):5d} (rank {rk_t:2d})"
              f" | teacher iou {allt[w]:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
