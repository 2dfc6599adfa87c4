#!/usr/bin/env python
"""Real-anatomy validation pass (VERDICT r3 "what's missing" #1 / item 9).

Every accuracy number in this repo so far was earned on synthetic phantoms
(`data.synth_slice*`).  This script runs the FULL product pipeline — RAW
file -> engine.process_single_image -> all five reference artifacts — on
the one genuinely real medical image reachable offline: matplotlib's
bundled ``s1045.ima.gz``, a 256x256 uint16 MR head slice, in exactly the
reference's input format (headerless little-endian u16,
/root/reference/src/preprocess.cpp:76).  A 13-variant pool (8 dihedral
orientations, 3 window/level remaps, 2 center crops — `data.real_mri_pool`)
keeps the pixels real while exercising resample ratios and contrast
distributions the synthetic eval never covers.

Per variant it reports:

* **twin parity** — polygon IoU of the {base}.json the product wrote vs the
  independent NumPy/cv2 reference-twin oracle on the same checkpoint
  (the content-independent claim: stage semantics hold on real anatomy);
* **plausibility** — fg IoU of the served mask vs an intensity pseudo-label
  (Otsu threshold on the normalized u8, run through the SAME cleanup
  semantics).  Honest framing: there is no ground truth for this slice;
  this is a distribution-shift probe of the synthetic-trained model, NOT
  an accuracy gate.  Gates stay on twin parity.
* **teacher agreement** — student-vs-teacher polygon IoU on real anatomy
  (the distillation contract under real shift), when the regenerable
  teacher checkpoint is present.

Writes benchmarks/results_real_mri.json and prints a table + one summary
JSON line.  CPU-safe (forces the CPU backend only if the default backend
fails to initialize); runs in ~2 min on one core.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_DIR))


def _otsu_threshold(u8: np.ndarray) -> int:
    """Otsu's between-class-variance threshold on a u8 image."""
    hist = np.bincount(u8.ravel(), minlength=256).astype(np.float64)
    csum = np.cumsum(hist)
    cmean = np.cumsum(hist * np.arange(256))
    w0 = csum / csum[-1]
    w1 = 1.0 - w0
    m0 = np.where(csum > 0, cmean / np.maximum(csum, 1), 0.0)
    m1 = np.where(csum[-1] - csum > 0,
                  (cmean[-1] - cmean) / np.maximum(csum[-1] - csum, 1), 0.0)
    return int(np.argmax(w0 * w1 * (m0 - m1) ** 2))


def main() -> int:
    # honor JAX_PLATFORMS=cpu via the config API too: while the axon tunnel
    # is wedged, the env var alone can hang at import inside the axon
    # register hook (CLAUDE.md pitfall; tests/conftest.py does the same)
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from unetseg_tpu import checkpoint, data, engine, metrics
    from unetseg_tpu import reference_twin as twin
    from unetseg_tpu.io import native, raw as raw_io
    from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

    pool = data.real_mri_pool()
    if not pool:
        print(json.dumps({"metric": "real_mri", "error":
                          "matplotlib sample data unavailable"}))
        return 1

    models_dir = os.path.join(os.path.dirname(_DIR), "models")
    loaded = checkpoint.load_serving(models_dir)
    if loaded is None:
        print(json.dumps({"metric": "real_mri", "error":
                          "no serving checkpoint"}))
        return 1
    params, cfg, serving = loaded
    import jax

    host_params = jax.device_get(params)

    # optional teacher for the agreement column (untracked/regenerable)
    teacher = None
    for cand in ("flagship_synth_robust.ckpt", "flagship_synth.ckpt"):
        p = os.path.join(models_dir, cand)
        if os.path.exists(p):
            teacher = checkpoint.load(p)
            break

    ckpt_path = os.path.join(tempfile.mkdtemp(prefix="real_mri_"),
                             "serving.ckpt")
    checkpoint.save(ckpt_path, params, cfg)
    assert engine.initialize_engine(ckpt_path)

    rows = []
    try:
        for name, raw in pool:
            h, w = raw.shape
            out_dir = tempfile.mkdtemp(prefix=f"real_{name}_")
            raw_path = os.path.join(out_dir, f"{name}.raw")
            raw_io.write_raw(raw_path, raw)

            ok = engine.process_single_image(raw_path, w, h, out_dir)
            assert ok, f"pipeline failed on {name}"
            artifacts = [f"{name}_normalized.png",
                         f"{name}_original_sizes.json",
                         f"{name}_mask.png",
                         f"{name}_contour_overlay.png",
                         f"{name}.json"]
            missing = [a for a in artifacts
                       if not os.path.exists(os.path.join(out_dir, a))]
            assert not missing, f"{name}: missing artifacts {missing}"

            with open(os.path.join(out_dir, f"{name}.json"), "rb") as f:
                shapes = json.load(f)["shapes"]
            ours = [[(int(x), int(y)) for x, y in s["points"]]
                    for s in shapes]

            u8 = preprocess_oracle_u8(raw, cfg.image_size)
            theirs = twin.twin_pipeline(host_params, cfg, u8, w, h)
            parity = metrics.polygon_iou(ours, theirs, w, h)

            # plausibility probe: Otsu pseudo-label through the same cleanup
            proxy = np.where(u8 > _otsu_threshold(u8), 2, 0).astype(np.uint8)
            proxy = native.postprocess_batch(proxy[None])[0]
            import cv2

            vis = cv2.imread(os.path.join(out_dir, f"{name}_mask.png"),
                             cv2.IMREAD_GRAYSCALE)
            pred = np.where(vis == 255, 2,
                            np.where(vis == 128, 1, 0)).astype(np.uint8)
            plaus = float(metrics.foreground_iou(pred, proxy))

            agree = None
            if teacher is not None:
                t_params, t_cfg = teacher
                t_poly = twin.twin_pipeline(jax.device_get(t_params), t_cfg,
                                            u8, w, h)
                agree = metrics.polygon_iou(ours, t_poly, w, h)

            rows.append({"variant": name, "w": w, "h": h,
                         "twin_parity": float(parity),
                         "plausibility_iou": float(plaus),
                         "teacher_agreement":
                         (None if agree is None else float(agree)),
                         "contours": len(ours)})
            print(f"{name:18s} parity {parity:.5f}  plaus {plaus:.4f}  "
                  f"agree {'-' if agree is None else f'{agree:.4f}'}  "
                  f"contours {len(ours)}")
    finally:
        engine.cleanup_resources()

    parities = [r["twin_parity"] for r in rows]
    plaus = [r["plausibility_iou"] for r in rows]
    agrees = [r["teacher_agreement"] for r in rows
              if r["teacher_agreement"] is not None]
    summary = {
        "metric": "real_mri_twin_parity_min",
        "value": float(np.min(parities)),
        "unit": "polygon_iou",
        "serving": serving,
        "variants": len(rows),
        "twin_parity_mean": float(np.mean(parities)),
        "plausibility_iou_mean": float(np.mean(plaus)),
        "plausibility_iou_min": float(np.min(plaus)),
        "teacher_agreement_mean":
        (float(np.mean(agrees)) if agrees else None),
        "teacher_agreement_min":
        (float(np.min(agrees)) if agrees else None),
    }
    out = {"rows": rows, "summary": summary}
    with open(os.path.join(_DIR, "results_real_mri.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
