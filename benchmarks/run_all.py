#!/usr/bin/env python
"""Run all five BASELINE benchmark configs and emit a JSON report.

Configs (BASELINE.md / BASELINE.json):
  1. single 512² slice -> polygon JSON (p50 latency)
  2. batch-32 512² slices, multi-class, per-class contour extraction
  3. 1024² tiles via sliding-window with overlap blending
  4. full 300-slice CT study end-to-end throughput
  5. TTA (flips/rot90) ensemble — single-chip here; the 8-way mesh variant is
     validated on the virtual CPU mesh in tests/test_parallel.py

Usage: python benchmarks/run_all.py [--slices N] [--out results.json]
Runs on whatever backend JAX selects (the TPU chip under the driver).
Synchronization fetches output elements (block_until_ready is unreliable on
tunneled backends).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slices", type=int, default=300)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # Wedged-backend watchdog (single-sourced with bench.py; armed before
    # the first jax import because even backend init can hang on a wedged
    # tunnel — round-4 review finding: this file previously hung forever).
    from unetseg_tpu.utils.watchdog import arm_backend_watchdog

    warm_done = arm_backend_watchdog(lambda deadline: print(json.dumps({
        "error": (f"device backend unresponsive within {deadline:.0f}s "
                  "(tunnel/device outage) — no configs measured")}),
        flush=True))

    import jax
    import jax.numpy as jnp

    from unetseg_tpu import train  # noqa: F401  (ensures module imports clean)
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.data import synth_batch, synth_slice
    from unetseg_tpu.io import native, raw as raw_io
    from unetseg_tpu.models import registry as model_registry, unet
    from unetseg_tpu.ops import decode, preprocess
    from unetseg_tpu.parallel import pipeline as ppl
    from unetseg_tpu.parallel import tiles, tta

    # Serving checkpoint: checkpoint.load_serving — the SAME single-sourced
    # policy bench.py uses (this file previously omitted the flagship tier
    # and silently fell to random-init where bench served the teacher).
    from unetseg_tpu import checkpoint

    mdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models")
    found = checkpoint.load_serving(mdir)
    if found is not None:
        params, cfg, ckpt_name = found
        params = jax.device_put(params)
    else:
        cfg = ModelConfig()
        params = unet.init(jax.random.key(0), cfg)
        ckpt_name = "random-init"
    rng = np.random.default_rng(0)
    report = {"device": str(jax.devices()[0]), "checkpoint": ckpt_name}

    def sync1(x):
        return float(x[(0,) * x.ndim])

    def timed(call, iters):
        """Warmup once, then queue ``iters`` dispatches and sync ONCE via an
        element fetch — the tunneled-backend timing discipline (CLAUDE.md:
        per-iteration sync adds ~28 ms of round trip to every loop pass;
        block_until_ready is not a reliable barrier).  Single-sourced here
        so the eight timing sites cannot drift (round-4 review finding).
        Returns seconds per iteration."""
        sync1(call())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = call()
        sync1(out)
        return (time.perf_counter() - t0) / iters

    # ---- config 1: single slice -> polygon JSON p50 latency --------------
    raw, _ = synth_slice(rng, 512)
    p50 = ppl.measure_p50_latency(params, cfg, raw, 512, 512, iters=15)
    warm_done.set()  # backend proved live end-to-end
    report["c1_p50_slice_to_json_ms"] = round(p50 * 1000, 2)

    # ---- config 2: batch-32, per-class contours --------------------------
    raws, _ = synth_batch(rng, 32, 512)

    @jax.jit
    def dev(params, raws):
        u8, x = preprocess.preprocess_batch(raws, 512)
        return decode.decode_mask(model_registry.apply(params, x, cfg),
                                   cfg.num_classes)

    raws_dev = jnp.asarray(raws)  # upload once; batches stay resident
    dt = timed(lambda: dev(params, raws_dev), 10)
    report["c2_batch32_device_slices_per_sec"] = round(32 / dt, 1)

    # serving batch (128, the dispatch-amortization sweet spot; bench.py)
    raws128 = jnp.asarray(np.repeat(raws, 4, axis=0))
    dt128 = timed(lambda: dev(params, raws128), 8)
    report["c2_serving_batch128_slices_per_sec"] = round(128 / dt128, 1)
    # per-class contour cost on realistic (ground-truth-shaped) masks — the
    # random-weight model's cleaned masks are empty, which would understate it
    _, labels32 = synth_batch(rng, 8, 512)
    t1 = time.perf_counter()
    n_contours = sum(
        len(cs)
        for k in range(8)
        for cs in native.contours_per_class(labels32[k]).values()
    )
    contour_ms = (time.perf_counter() - t1) / 8 * 1000
    report["c2_per_class_contour_ms_per_slice_host"] = round(contour_ms, 2)
    report["c2_total_contours"] = n_contours

    # ---- config 2b: ALL-DEVICE serving (device postprocess v3 fused) -----
    # VERDICT r3 item 4: benchmark device_postprocess=True end-to-end.
    from unetseg_tpu.ops import postprocess as device_post

    on_tpu = jax.devices()[0].platform == "tpu"

    @jax.jit
    def fused_all_device(p, raws):
        _, x = preprocess.preprocess_batch(raws, 512)
        mask = decode.decode_mask(model_registry.apply(p, x, cfg),
                                  cfg.num_classes)
        return device_post.postprocess_batch(mask, use_pallas_cc=on_tpu)

    dt = timed(lambda: fused_all_device(params, raws_dev), 5)
    report["c2_all_device_slices_per_sec"] = round(32 / dt, 1)
    report["c2_all_device_ms_per_batch"] = round(dt * 1000, 1)

    # ---- config 3: 1024² sliding window ----------------------------------
    big = np.zeros((1024, 1024), np.uint16)
    s0, _ = synth_slice(rng, 512)
    big[:512, :512] = s0
    big[512:, 512:] = synth_slice(rng, 512)[0]
    fn = tiles.make_tiled_pipeline(cfg, window=512, overlap=256,
                                  device_postprocess=False)
    u8big = jnp.asarray((big >> 8).astype(np.uint8))
    dt = timed(lambda: fn(params, u8big), 5)
    report["c3_1024_tile_sliding_window_ms"] = round(dt * 1000, 1)
    report["c3_equivalent_512_slices_per_sec"] = round(4 / dt, 1)

    # batched variant: 8 tiles of 1024² as ONE program (all 72 windows in a
    # single model batch, vmapped blend) — the dispatch/underfill fix
    big8 = np.stack([big] * 8)
    big8[1:, :512, 512:] = synth_slice(rng, 512)[0]
    fnb = tiles.make_tiled_batch_pipeline(cfg, window=512, overlap=256,
                                          device_postprocess=False)
    u8big8 = jnp.asarray((big8 >> 8).astype(np.uint8))
    dtb = timed(lambda: fnb(params, u8big8), 5)
    report["c3_batched8_ms"] = round(dtb * 1000, 1)
    report["c3_batched_equivalent_512_slices_per_sec"] = round(8 * 4 / dtb, 1)

    # ---- config 4: full study throughput ---------------------------------
    # Measured per artifact tier (VERDICT r3 item 2): no artifacts (pure
    # pipeline), JSON-only, mask+JSON, and the full five-artifact reference
    # set — all through the batched native emitter (csrc/emit.cpp).
    n = args.slices
    with tempfile.TemporaryDirectory() as td:
        paths = []
        raws_np, _ = synth_batch(rng, min(n, 32), 512)
        for i in range(n):
            p = f"{td}/s{i:04d}.raw"
            raw_io.write_raw(p, raws_np[i % raws_np.shape[0]])
            paths.append(p)
        for tier in (None, "json", "mask_json", "full"):
            out_dir = None if tier is None else f"{td}/out_{tier}"
            res = ppl.run_study(params, cfg, paths, 512, 512, batch_size=128,
                                host_preprocess=True, artifacts=tier,
                                out_dir=out_dir)
            key = "e2e" if tier is None else tier
            report[f"c4_study_slices_per_sec_{key}"] = round(
                res.slices_per_sec, 1)
    report["c4_study_slices"] = n
    report["c4_study_wall_s_full"] = round(res.wall_s, 2)  # last tier only

    # ---- config 5: TTA ensemble (single chip) ----------------------------
    u8 = jnp.asarray((synth_slice(rng, 512)[0] >> 8).astype(np.uint8))
    fn = tta.make_tta_pipeline(cfg, device_postprocess=False)
    dt = timed(lambda: fn(params, u8), 5)
    report["c5_tta8_ensemble_ms_per_slice"] = round(dt * 1000, 1)

    # batched TTA: 16 slices x 8 views as one program (dispatch amortized)
    u8_16 = jnp.asarray(np.stack(
        [(synth_slice(rng, 512)[0] >> 8).astype(np.uint8) for _ in range(16)]))
    fnb5 = tta.make_tta_batch_pipeline(cfg, device_postprocess=False)
    dtb5 = timed(lambda: fnb5(params, u8_16), 5)
    report["c5_tta8_batched16_ms_per_slice"] = round(dtb5 * 1000 / 16, 2)

    # weight-space TTA (tta.transform_params_dihedral): the ensemble as 8
    # transformed-weight passes over untransposed activations — the
    # production config-5 path (engine.infer_tta)
    fnw5 = tta.make_tta_weightspace_pipeline(cfg, device_postprocess=False)
    dtw5 = timed(lambda: fnw5(params, u8_16), 5)
    report["c5_tta8_weightspace16_ms_per_slice"] = round(dtw5 * 1000 / 16, 2)

    line = json.dumps(report, sort_keys=True)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
