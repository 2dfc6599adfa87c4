#!/usr/bin/env python
"""Distribution-shift robustness evaluation (VERDICT r3 item 9, proxy).

No real CT/pathology data is reachable in this environment (zero network
egress; no bundled medical datasets in any installed package — verified),
so the "real data" validation is proxied by shape/texture families the
models were NEVER trained on (data.synth_slice_shifted): lobulated organs,
crescents (concave boundaries), and illumination-gradient + streak-noise
slices.  For each family this reports:

* student (the SHIPPED serving checkpoint, checkpoint.load_serving) and
  teacher decoded-mask fg IoU vs labels (mean / min),
* student-vs-teacher mask agreement — against the ROBUSTIFIED teacher the
  student was actually distilled from when present (the distillation
  contract off-family); teacher columns are None when no regenerable
  teacher checkpoint exists on this checkout,
* full-pipeline polygon parity vs the reference-twin oracle (must stay ~1.0
  regardless of content: parity is about stage semantics, not the model).

Usage: python benchmarks/eval_shift.py [n_per_kind]
"""

import zlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, data, metrics, reference_twin as twin
    from unetseg_tpu.io import native
    from unetseg_tpu.models import registry
    from unetseg_tpu.ops import decode

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    if len(sys.argv) > 2:
        # explicit candidate checkpoint: gate a NOT-yet-shipped student
        # (e.g. models/flagship_slim5_cand.ckpt) under the exact shipped
        # protocol before promoting it through the serving policy
        s_params, s_cfg = checkpoint.load(sys.argv[2])
        s_name = os.path.basename(sys.argv[2])
    else:
        # The SHIPPED student (single-sourced serving policy — hand-rolling
        # flagship_slim4.ckpt here re-introduced the divergence load_serving
        # exists to prevent; round-4 review finding).
        found = checkpoint.load_serving(os.path.join(REPO, "models"),
                                        include_flagship=False)
        if found is None:
            print(json.dumps({"error": "no serving student checkpoint"}))
            return 1
        s_params, s_cfg, s_name = found
    s_params = jax.device_put(s_params)

    # Teacher: the ROBUSTIFIED one the student was distilled from when
    # present; both are regenerable/untracked, so their absence on a fresh
    # clone must degrade to student-only metrics, not crash (round-4
    # review finding; matches eval_real.py).
    t_params = t_cfg = t_name = None
    for cand in ("flagship_synth_robust.ckpt", "flagship_synth.ckpt"):
        p = os.path.join(REPO, "models", cand)
        if os.path.exists(p):
            t_params, t_cfg = checkpoint.load(p)
            t_params = jax.device_put(t_params)
            t_name = cand
            break

    def make_pred(cfg):
        @jax.jit
        def f(p, u8):
            x = u8.astype(jnp.float32)[..., None] / 255.0
            return jnp.argmax(registry.apply(p, x, cfg),
                              axis=-1).astype(jnp.uint8)
        return f

    fs = make_pred(s_cfg)
    ft = make_pred(t_cfg) if t_cfg is not None else None
    report = {"student": s_name, "teacher": t_name}
    host_s = jax.device_get(s_params)

    for kind in ("lobulated", "crescent", "illum", "multiorgan"):
        rng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31)
        raws = np.empty((n, 512, 512), np.uint16)
        labels = np.empty((n, 512, 512), np.uint8)
        for i in range(n):
            raws[i], labels[i] = data.synth_slice_shifted(rng, 512, kind)
        u8 = np.stack([native.preprocess_u8(r, 512) for r in raws])
        ps = np.asarray(fs(s_params, jnp.asarray(u8)))
        s_iou = [float(metrics.foreground_iou(ps[i], labels[i]))
                 for i in range(n)]
        t_iou = agree = None
        if ft is not None:
            pt = np.asarray(ft(t_params, jnp.asarray(u8)))
            t_iou = [float(metrics.foreground_iou(pt[i], labels[i]))
                     for i in range(n)]
            agree = [float(metrics.foreground_iou(ps[i], pt[i]))
                     for i in range(n)]

        # full-pipeline parity vs the twin oracle on 4 slices, through the
        # product's own polygonize+scale (native.scaled_polygons) — not a
        # re-implementation that could silently diverge
        parity = []
        for i in range(min(4, n)):
            mask = native.postprocess_batch(ps[i][None])[0]
            vis = np.asarray(decode.mask_to_image(jnp.asarray(mask)))
            ours = native.scaled_polygons(vis, 1024, 768)
            theirs = twin.twin_pipeline(host_s, s_cfg, u8[i], 1024, 768)
            parity.append(metrics.polygon_iou(ours, theirs, 1024, 768))

        bds = [metrics.boundary_distances(ps[i], labels[i])
               for i in range(n)]
        hd95s = [d["hd95"] for d in bds if np.isfinite(d["hd95"])]
        misses = n - len(hd95s)  # slices with no predicted fg (inf distance)
        hd95_max = round(float(np.max(hd95s)), 2) if hd95s else None

        report[kind] = {
            "student_fg_iou": round(float(np.mean(s_iou)), 5),
            "student_fg_iou_min": round(float(np.min(s_iou)), 5),
            "student_hd95_max_px": hd95_max,
            "student_boundary_misses": misses,
            "teacher_fg_iou":
                (None if t_iou is None else round(float(np.mean(t_iou)), 5)),
            "teacher_fg_iou_min":
                (None if t_iou is None else round(float(np.min(t_iou)), 5)),
            "student_teacher_agreement":
                (None if agree is None else round(float(np.mean(agree)), 5)),
            "agreement_min":
                (None if agree is None else round(float(np.min(agree)), 5)),
            "pipeline_twin_parity": round(float(np.mean(parity)), 5),
        }
        print(kind, json.dumps(report[kind]), flush=True)

    print(json.dumps({"shift_eval": report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
