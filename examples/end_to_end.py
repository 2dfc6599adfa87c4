#!/usr/bin/env python
"""End-to-end demo: train on synthetic shapes -> checkpoint -> serve RAW
slices through the engine -> polygon JSON -> evaluate.

Run on any backend:
    python examples/end_to_end.py --out /tmp/unetseg_demo

(On CPU this uses a small model; on TPU pass --full for the 512² flagship.)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unetseg_demo")
    ap.add_argument("--full", action="store_true",
                    help="512² flagship model (TPU recommended)")
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()

    import jax

    from unetseg_tpu import checkpoint, engine, metrics, train
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.data import synth_slice, training_batch
    from unetseg_tpu.io import raw as raw_io

    size = 512 if args.full else 64
    cfg = (ModelConfig() if args.full else
           ModelConfig(base_channels=8, depth=2, image_size=64,
                       compute_dtype="float32"))
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)

    # 1. train
    tx = train.make_optimizer(lr=1e-2, total_steps=args.steps)
    state = train.init_state(jax.random.key(0), cfg, tx)
    step = jax.jit(lambda s, b: train.train_step(s, b, cfg, tx),
                   donate_argnums=(0,))
    for i in range(args.steps):
        imgs, labels = training_batch(rng, 8, size=size)
        state, loss = step(state, (imgs, labels))
        if i % 25 == 0:
            print(f"step {i:4d} loss {float(loss):.4f}")

    # 2. checkpoint (the engine's plan-file analog)
    cache = os.path.join(args.out, "engine", "model.ckpt")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    checkpoint.save(cache, state.params, cfg)

    # 3. serve
    assert engine.initialize_engine(cache)
    raw, gt = synth_slice(rng, size)
    raw_path = os.path.join(args.out, "case_001.raw")
    raw_io.write_raw(raw_path, raw)
    ok = engine.process_single_image(raw_path, size, size,
                                     os.path.join(args.out, "results"))
    print("process_single_image:", ok)

    # 4. evaluate the polygon JSON against ground truth
    cj = os.path.join(args.out, "results", "case_001.json")
    if os.path.exists(cj):
        with open(cj) as f:
            shapes = json.load(f)["shapes"]
        contours = [[tuple(p) for p in s["points"]] for s in shapes]
        import cv2

        gt_mask = (gt == 2).astype(np.uint8)
        gt_contours, _ = cv2.findContours(
            gt_mask * 255, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        gt_cs = [[tuple(int(v) for v in p) for p in c.reshape(-1, 2)]
                 for c in gt_contours]
        iou = metrics.polygon_iou(contours, gt_cs, size, size)
        print(f"polygon IoU vs ground truth: {iou:.4f}")
    engine.cleanup_resources()
    print("artifacts in", os.path.join(args.out, "results"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
