#!/usr/bin/env python
"""Headline benchmark: 512² slices/sec/chip through the fused device pipeline.

Measures the dense device path the framework deploys — u8 normalize ->
UNet -> argmax decode — as one XLA executable at the serving batch (128,
the measured dispatch-amortization sweet spot), on whatever backend JAX
selects (the driver runs this on one real TPU chip).  The serving model is
`checkpoint.load_serving`'s pick (slim5 if shipped > slim4 specialist >
slim4 robust > gen-1 slim > flagship teacher — the single-sourced policy
all benchmarks share),
falling back to random init when no checkpoint exists.  Mask cleanup runs
on the host in production, pipelined off the device's critical path (see
the comment in main()).

Prints ONE JSON line covering the BASELINE.md metrics:
  value              512² slices/sec/chip (vs_baseline = value/500)
  fg_iou             foreground IoU of the serving checkpoint on 32 held-out
                     synthetic slices (mean; fg_iou_min = worst slice)
  parity_polygon_iou polygon IoU of the production pipeline vs the
                     reference-twin oracle (unetseg_tpu/reference_twin.py:
                     NumPy/cv2 transcription of src/process.cpp:188-262 ->
                     postprocess.cpp -> mask2polygon.cpp) on the SAME
                     checkpoint — the BASELINE "IoU vs the C++ reference"
  agreement_polygon_iou  slim-vs-flagship polygon IoU (distillation contract)
  p50_ms             single-slice RAW -> polygon-JSON p50 latency
  h2d_gbps / p50_ms_note  measured dev-box tunnel H2D rate and the latency
                     share it explains (production chips attach directly)
"""

import json
import os
import sys
import time

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
# Teacher checkpoint: a regenerable artifact (62 MB, untracked — see
# docs/PERFORMANCE.md "Teacher regeneration").  When absent, the agreement
# gate below honestly reports null rather than failing the bench.
FLAGSHIP = os.path.join(_DIR, "models", "flagship_synth.ckpt")


def _parse_batch_arg() -> int:
    """argv[1] as a positive batch size, or exit 2 with usage.  Called at
    main() entry, BEFORE any jax touch: an argv typo must fail fast, not
    after (or hung inside) device setup."""
    if len(sys.argv) <= 1:
        return 128
    try:
        batch = int(sys.argv[1])
    except ValueError:
        batch = 0
    if batch <= 0:
        print(f"usage: {sys.argv[0]} [batch_size>0]", file=sys.stderr)
        raise SystemExit(2)
    return batch


def main() -> int:
    batch = _parse_batch_arg()
    # Wedged-backend watchdog (single-sourced; see utils/watchdog.py):
    # armed before the first jax import, disarmed after the first real
    # execution.  Generous default deadline — a cold persistent cache
    # legitimately spends minutes compiling through the remote helper.
    from unetseg_tpu.utils.watchdog import arm_backend_watchdog

    def _report_outage(deadline_s: float) -> None:
        print(json.dumps({
            "metric": ("512^2 slices/sec/chip (fused normalize+UNet+"
                       "argmax device pipeline)"),
            "value": 0.0, "unit": "slices/sec", "vs_baseline": 0.0,
            "error": (f"device backend unresponsive: setup + first "
                      f"execution did not complete within "
                      f"{deadline_s:.0f}s (tunnel/device outage, not a "
                      "framework regression — last validated real-TPU "
                      "numbers: docs/PERFORMANCE.md headline, "
                      "benchmarks/results_r4_tpu.json)"),
        }), flush=True)

    warm_done = arm_backend_watchdog(_report_outage)

    import jax
    import jax.numpy as jnp

    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import registry as model_registry, unet
    from unetseg_tpu.ops import decode, preprocess

    from unetseg_tpu import checkpoint

    found = checkpoint.load_serving(os.path.join(_DIR, "models"))
    if found is not None:
        params, cfg, serving = found
        params = jax.device_put(params)
    else:
        cfg = ModelConfig()
        params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
        serving = "random-init"

    # Serving batch: 128 is the measured dispatch-amortization sweet spot
    # for the slim4 geometry (benchmarks/RESULTS_r3.md batch-scaling table;
    # throughput flattens at 256). Host cleanup (0.99 ms/mask C++) still
    # fits production hosts' ~14 cores/chip at this rate.
    # The production device program (engine.py _pipeline): normalize -> UNet
    # -> argmax decode.  Mask cleanup runs on the host (C++ union-find,
    # ~1 ms/mask) pipelined against device work — on production v5e hosts
    # (~14 cores/chip) it is not the bottleneck, and including it here on
    # this 1-core dev box would measure the box, not the design.
    def make_pipeline(c):
        @jax.jit
        def pipeline(p, u8):
            x = preprocess.model_input_from_u8(u8)[..., None]
            logits = model_registry.apply(p, x, c)
            return decode.decode_mask(logits, c.num_classes)
        return pipeline

    pipeline = make_pipeline(cfg)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(batch, 512, 512), dtype=np.uint8)
    u8 = jnp.asarray(base)

    def sync(out):
        # block_until_ready is not a reliable barrier on tunneled backends
        # (observed on axon); fetching one element forces real completion.
        return int(out[0, 0, 0])

    # warmup / compile (disarms the backend watchdog armed at main() entry)
    sync(pipeline(params, u8))
    warm_done.set()
    sync(pipeline(params, u8))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, u8)
    sync(out)
    dt = time.perf_counter() - t0
    slices_per_sec = batch * iters / dt

    # --- measured host->device rate (annotates the tunnel bias) ------------
    big = np.zeros((64, 1024, 1024), np.uint8)  # 64 MB
    # untimed warmup: the element-fetch gather for this shape compiles on
    # first use (~30 s through the remote helper on a cold cache) and must
    # not land inside the transfer measurement (round-4 review finding)
    _ = int(jax.device_put(big)[0, 0, 0])
    t0 = time.perf_counter()
    dev = jax.device_put(big)
    _ = int(dev[0, 0, 0])
    h2d_gbps = big.nbytes / (time.perf_counter() - t0) / 1e9

    # dispatch+sync round trip of a no-op program: the fixed per-call tax a
    # tunneled dev box adds to every synchronous (latency-style) call.
    noop = jax.jit(lambda x: x + 1)
    small = jnp.zeros((8, 128), jnp.float32)
    int(noop(small)[0, 0])
    rts = []
    for _ in range(10):
        t0 = time.perf_counter()
        int(noop(small)[0, 0])
        rts.append(time.perf_counter() - t0)
    dispatch_rt_ms = float(np.percentile(rts, 50)) * 1e3

    # --- accuracy + parity on held-out synthetic slices --------------------
    fg_iou = fg_min = parity = agreement = agreement_min = None
    hd95_max = assd_mean = boundary_misses = None
    if serving != "random-init":
        from unetseg_tpu import data, metrics

        vrng = np.random.default_rng(991)
        raws, labels = data.synth_batch(vrng, 32)
        u8v = np.stack([preprocess.preprocess_oracle_u8(r, 512) for r in raws])
        pred = np.asarray(pipeline(params, jnp.asarray(u8v)))
        ious = [float(metrics.foreground_iou(pred[i], labels[i]))
                for i in range(len(labels))]
        fg_iou = float(np.mean(ious))
        fg_min = float(np.min(ious))

        # boundary-distance complement (the deliverable is a contour; IoU
        # is blind to where on the rim the error sits).  Informational —
        # the gates stay on the IoU minimums.
        bds = [metrics.boundary_distances(pred[i], labels[i])
               for i in range(len(labels))]
        finite = [d for d in bds if np.isfinite(d["hd95"])]
        # a slice with NO predicted foreground has no finite boundary
        # distance; count it separately instead of conflating it with
        # "metric not computed" (null) — the max/mean cover finite slices
        boundary_misses = len(bds) - len(finite)
        hd95_max = (float(max(d["hd95"] for d in finite))
                    if finite else None)
        assd_mean = (float(np.mean([d["assd"] for d in finite]))
                     if finite else None)

        # parity vs the reference twin (full pipeline, same checkpoint),
        # at a non-trivial original resolution to exercise the truncating
        # coordinate scale (src/mask2polygon.cpp:41-63).  The twin covers
        # arch 'unet' only — a registry-arch serving checkpoint (unetpp /
        # attention / w8a8) must skip parity (None), not crash the whole
        # benchmark after the throughput work (round-4 review finding).
        from unetseg_tpu.io import native

        if cfg.arch == "unet":
            from unetseg_tpu import reference_twin as twin

            host_params = jax.device_get(params)
            ow, oh = 1024, 768
            vals = []
            for i in range(4):
                mask = native.postprocess_batch(pred[i][None])[0]
                vis = decode.mask_to_image_np(mask)
                ours = native.scaled_polygons(vis, ow, oh)
                theirs = twin.twin_pipeline(host_params, cfg, u8v[i], ow, oh)
                vals.append(metrics.polygon_iou(ours, theirs, ow, oh))
            parity = float(np.mean(vals))

        # student-vs-flagship polygon agreement (the distillation contract)
        if serving in ("slim", "slim4", "slim5") and os.path.exists(FLAGSHIP):
            t_params, t_cfg = checkpoint.load(FLAGSHIP)
            t_pipe = make_pipeline(t_cfg)
            t_pred = np.asarray(t_pipe(jax.device_put(t_params),
                                       jnp.asarray(u8v)))
            m_s_all = native.postprocess_batch(pred)
            m_t_all = native.postprocess_batch(t_pred)
            avals = []
            for i in range(len(labels)):
                p_s = native.scaled_polygons(
                    decode.mask_to_image_np(m_s_all[i]), 512, 512)
                p_t = native.scaled_polygons(
                    decode.mask_to_image_np(m_t_all[i]), 512, 512)
                avals.append(metrics.polygon_iou(p_s, p_t, 512, 512))
            agreement = float(np.mean(avals))
            agreement_min = float(np.min(avals))

    # --- p50 single-slice RAW -> polygon-JSON latency -----------------------
    from unetseg_tpu.parallel import pipeline as study_pipeline

    # a REALISTIC slice, not uint16 noise: noise post-cleanup masks are
    # empty, which skips the contour-trace + JSON stages this metric is
    # named for and biases p50 low (round-4 review finding)
    from unetseg_tpu import data

    raw, _ = data.synth_slice(np.random.default_rng(7), 512)
    p50_ms = study_pipeline.measure_p50_latency(
        params, cfg, raw, 512, 512, iters=20) * 1e3
    # a synchronous slice call pays at least one tunnel round trip plus the
    # u8 transfers — none of which a production direct-attach host pays
    tunnel_ms = min(
        p50_ms,
        dispatch_rt_ms + 2 * (512 * 512) / (h2d_gbps * 1e9) * 1e3)

    baseline = 500.0
    print(json.dumps({
        "metric": "512^2 slices/sec/chip (fused normalize+UNet+argmax device pipeline)",
        "value": round(slices_per_sec, 2),
        "unit": "slices/sec",
        "vs_baseline": round(slices_per_sec / baseline, 3),
        "serving_checkpoint": serving,
        "serving_batch": batch,
        "fg_iou": round(fg_iou, 4) if fg_iou is not None else None,
        "fg_iou_min": round(fg_min, 4) if fg_min is not None else None,
        "parity_polygon_iou": round(parity, 4) if parity is not None else None,
        "agreement_polygon_iou": (round(agreement, 4)
                                  if agreement is not None else None),
        "agreement_polygon_iou_min": (round(agreement_min, 4)
                                      if agreement_min is not None else None),
        # Named accuracy gates, graded on the per-slice MINIMUM (the number
        # that matters for a medical tool; VERDICT r3 item 1): contract is
        # >= 0.999 worst-slice fg IoU at >= 10x baseline throughput.
        "hd95_max_px": (round(hd95_max, 2) if hd95_max is not None else None),
        "assd_mean_px": (round(assd_mean, 3)
                         if assd_mean is not None else None),
        "boundary_miss_count": boundary_misses,
        "gate_fg_iou_min": (None if fg_min is None
                            else bool(fg_min >= 0.999)),
        "gate_throughput_10x": bool(slices_per_sec >= 10 * baseline),
        "p50_ms": round(p50_ms, 2),
        "h2d_gbps": round(h2d_gbps, 3),
        "dispatch_rt_ms": round(dispatch_rt_ms, 2),
        "p50_ms_note": (
            f"~{tunnel_ms:.1f} ms of this p50 is dev-box tunnel overhead "
            f"({dispatch_rt_ms:.1f} ms dispatch round trip measured on a "
            "no-op program); production direct-attach hosts do not pay it"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
