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

Beyond the per-variant serial loop it also drives the OTHER serving modes
on real pixels: the batched directory path (byte-equality vs the serial
artifacts over the 11 same-size variants), the 8-fold TTA path, the
native-resolution sliding-window path on the slice at 512²
(`data.real_mri_512`, compared against the full-frame polygons), and a
multi-organ mosaic that pins the reference's 6%-of-frame cleanup floor
(`data.real_mri_mosaic`).

Writes benchmarks/results_real_mri.json and prints a table + one summary
JSON line.  Runs on whatever backend JAX selects; to run off-TPU set
JAX_PLATFORMS=cpu (honored via the config API too, which bypasses a wedged
axon relay — there is NO automatic fallback when the default backend
hangs).  Runs in a few minutes on one core.
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

    # stable path so the JAX persistent compile cache (keyed next to the
    # checkpoint, engine.py) survives across runs — a fresh tmpdir would
    # recompile ~25 min of CPU executables every invocation
    cache_root = os.path.join(_DIR, ".real_mri_cache")
    os.makedirs(cache_root, exist_ok=True)
    ckpt_path = os.path.join(cache_root, "serving.ckpt")
    checkpoint.save(ckpt_path, params, cfg)
    assert engine.initialize_engine(ckpt_path)

    # one parent scratch dir so every artifact tree is reclaimed at the end
    # (repeat runs previously leaked ~17 mkdtemp trees of PNGs per
    # invocation; round-4 review finding)
    workdir = tempfile.mkdtemp(prefix="eval_real_")

    rows = []
    try:
        for name, raw in pool:
            h, w = raw.shape
            out_dir = tempfile.mkdtemp(prefix=f"real_{name}_", dir=workdir)
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
                         "contours": len(ours),
                         "_out_dir": out_dir, "_raw_path": raw_path})
            print(f"{name:18s} parity {parity:.5f}  plaus {plaus:.4f}  "
                  f"agree {'-' if agree is None else f'{agree:.4f}'}  "
                  f"contours {len(ours)}")

        # -- B. batched product path on real anatomy: byte-equal to serial --
        # process_batch requires same-sized slices; the 11 256² variants
        # qualify (crops are 192/224).  Every artifact byte must match the
        # serial run above — the batched-equals-serial contract, previously
        # proven only on synthetic phantoms.
        b_rows = [r for r in rows if r["w"] == 256 and r["h"] == 256]
        b_out = tempfile.mkdtemp(prefix="real_batched_", dir=workdir)
        out_dirs = []
        for r in b_rows:
            d = os.path.join(b_out, r["variant"])
            os.makedirs(d, exist_ok=True)
            out_dirs.append(d)
        okc, failc = engine.process_batch(
            [r["_raw_path"] for r in b_rows], 256, 256, out_dirs)
        assert okc == len(b_rows) and failc == 0, (okc, failc)
        batched_equal = True
        for r, d in zip(b_rows, out_dirs):
            base = r["variant"]
            for suffix in ("_normalized.png", "_original_sizes.json",
                           "_mask.png", "_contour_overlay.png", ".json"):
                a = open(os.path.join(r["_out_dir"], base + suffix),
                         "rb").read()
                b = open(os.path.join(d, base + suffix), "rb").read()
                if a != b:
                    batched_equal = False
                    print(f"BATCH MISMATCH {base}{suffix}")
        print(f"batched-vs-serial byte equality over {len(b_rows)} real "
              f"variants x 5 artifacts: {batched_equal}")

        # -- C. TTA product path on real anatomy --------------------------
        tta_dir = tempfile.mkdtemp(prefix="real_tta_", dir=workdir)
        raw0 = next(r for r in rows if r["variant"] == "rot0")
        import shutil

        tta_raw = os.path.join(tta_dir, "rot0.raw")
        shutil.copy(raw0["_raw_path"], tta_raw)
        assert engine.process_single_image(tta_raw, 256, 256, tta_dir,
                                           tta=True)
        with open(os.path.join(tta_dir, "rot0.json"), "rb") as f:
            tta_polys = [[(int(x), int(y)) for x, y in s["points"]]
                         for s in json.load(f)["shapes"]]
        with open(os.path.join(raw0["_out_dir"], "rot0.json"), "rb") as f:
            base_polys = [[(int(x), int(y)) for x, y in s["points"]]
                          for s in json.load(f)["shapes"]]
        tta_vs_base = float(metrics.polygon_iou(tta_polys, base_polys,
                                                256, 256))
        print(f"tta-vs-single polygon IoU on real slice: {tta_vs_base:.4f}")

        # -- D. sliding-window path at native 512² on real anatomy --------
        # data.real_mri_512 is the real slice through the reference's OWN
        # truncating-bilinear resample (the same transform the serial path
        # applies internally), kept at u16.  Content therefore matches what
        # the full-frame path inferred on, so the Hann-blended window output
        # is directly comparable to the serial polygons: the IoU isolates
        # window-blend effects (local context, overlap-add) from content.
        big = data.real_mri_512()
        win_dir = tempfile.mkdtemp(prefix="real_window_", dir=workdir)
        big_raw = os.path.join(win_dir, "big.raw")
        raw_io.write_raw(big_raw, big)
        assert engine.process_single_image(big_raw, 512, 512, win_dir,
                                           window=256)
        with open(os.path.join(win_dir, "big.json"), "rb") as f:
            win_polys = [[(int(x), int(y)) for x, y in s["points"]]
                         for s in json.load(f)["shapes"]]
        # serial rot0 polygons are in 256² original coords; scale to 512²
        base512 = [[(2 * x, 2 * y) for x, y in p] for p in base_polys]
        win_vs_serial = float(metrics.polygon_iou(win_polys, base512,
                                                  512, 512))
        print(f"sliding-window (512² real, window=256) vs full-frame "
              f"polygon IoU: {win_vs_serial:.4f}  "
              f"contours {len(win_polys)}")

        # -- E. multi-organ frame: cleanup-semantics pin -------------------
        # A 2x2 dihedral mosaic of the slice (every pixel genuine) puts FOUR
        # organs in one 512² frame.  The reference's cleanup erases connected
        # components below 6% of the FRAME (MIN_AREA_RATIO,
        # src/postprocess.cpp:47-79); each head's surviving region is ~4%,
        # so the faithful product output is an empty mask and no contour
        # JSON ("Warning: No Contours Detected") — same as the reference
        # would emit.  Pin exactly that.
        mosaic = data.real_mri_mosaic(2)
        mos_dir = tempfile.mkdtemp(prefix="real_mosaic_", dir=workdir)
        mosaic_raw = os.path.join(mos_dir, "mosaic.raw")
        raw_io.write_raw(mosaic_raw, mosaic)
        assert engine.process_single_image(mosaic_raw, 512, 512, mos_dir,
                                           window=256)
        from unetseg_tpu.io import png as png_io
        from unetseg_tpu.ops.preprocess import normalize_u8
        import jax.numpy as jnp

        mos_mask = png_io.read_png_gray(
            os.path.join(mos_dir, "mosaic_mask.png"))
        mosaic_empty = bool((np.asarray(mos_mask) == 0).all())
        mosaic_json = os.path.exists(os.path.join(mos_dir, "mosaic.json"))
        # diagnostic: the model DOES segment the heads pre-cleanup — show
        # the area accounting that the 6% rule then applies
        eng = engine.get_engine()
        pre = np.asarray(eng.infer_tiled(np.asarray(
            normalize_u8(jnp.asarray(np.asarray(mosaic)))), 256))
        print(f"mosaic pre-cleanup fg px {int((pre > 0).sum())} "
              f"(4 organs), per-organ survivor < 6% floor "
              f"{0.06 * pre.size:.0f} px -> cleaned mask empty: "
              f"{mosaic_empty}, json emitted: {mosaic_json}")
        assert mosaic_empty and not mosaic_json, (
            "multi-organ cleanup semantics changed")
    finally:
        engine.cleanup_resources()
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    for r in rows:  # internal bookkeeping, not part of the report
        r.pop("_out_dir"), r.pop("_raw_path")

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
        "batched_byte_equal": bool(batched_equal),
        "batched_variants": len(b_rows),
        "tta_vs_single_polygon_iou": tta_vs_base,
        "window_vs_serial_polygon_iou": win_vs_serial,
        "window_contours": len(win_polys),
        "mosaic_multiorgan_cleanup_empty": mosaic_empty,
    }
    out = {"rows": rows, "summary": summary}
    with open(os.path.join(_DIR, "results_real_mri.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
