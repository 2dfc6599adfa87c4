#!/usr/bin/env python
"""Round-4 serving features demo: cascade routing + artifact tiers.

    python examples/cascade_tiers.py --out /tmp/unetseg_cascade_demo

Builds three small checkpoints (a compact serving student, a co-student
for the disagreement router, a larger fallback), initializes the engine
with the RECOMMENDED ``disagree`` cascade (route slices where the two
students' masks disagree to the fallback — catches confidently-wrong
failures a confidence margin misses, benchmarks/RESULTS_r4.md), and
processes a directory at the ``json`` artifact tier (size + contour JSON
only — the high-throughput study setting; ``full`` reproduces all five
reference artifacts).

Production equivalents:
    CLI:      init ckpt --cascade-disagree co.ckpt fallback.ckpt
              process --tier json <dir> 512 512 <out>
    service:  {"cmd": "init", ..., "cascade_router": "disagree", ...}
              {"cmd": "process", ..., "tier": "json"}
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unetseg_cascade_demo")
    args = ap.parse_args()

    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.data import synth_slice
    from unetseg_tpu.io import raw as raw_io

    out = args.out
    os.makedirs(out, exist_ok=True)
    small = dict(base_channels=8, depth=2, image_size=64,
                 compute_dtype="float32")

    # three checkpoints: serving student, co-student (different seed: the
    # router signal IS their disagreement), stronger fallback
    student = os.path.join(out, "student.ckpt")
    co = os.path.join(out, "co.ckpt")
    fallback = os.path.join(out, "fallback.ckpt")
    checkpoint.create(student, ModelConfig(**small), seed=0)
    checkpoint.create(co, ModelConfig(**small), seed=1)
    checkpoint.create(fallback, ModelConfig(**{**small,
                                               "base_channels": 16}), seed=2)

    # a tiny "study" of RAW slices
    rng = np.random.default_rng(0)
    study = os.path.join(out, "study")
    os.makedirs(study, exist_ok=True)
    for i in range(4):
        raw, _ = synth_slice(rng, 64)
        raw_io.write_raw(os.path.join(study, f"s{i}_64_64.raw"), raw)

    assert engine.initialize_engine(
        student,
        cascade_ckpt=fallback,
        cascade_router="disagree",
        cascade_co_ckpt=co,
        cascade_threshold=16.0,  # route when >16 px of the masks disagree
    )
    try:
        paths = sorted(
            os.path.join(study, f) for f in os.listdir(study))
        out_dirs = [os.path.join(out, "artifacts")] * len(paths)
        ok, fail = engine.process_batch(paths, 64, 64, out_dirs,
                                        batch_size=4, tier="json")
        print(f"processed ok={ok} fail={fail}")
        arts = sorted(os.listdir(out_dirs[0]))
        print("artifacts (json tier):", arts)
        # json tier: size JSON always; contour JSON only when contours exist
        assert all(a.endswith(".json") for a in arts)
        one = [a for a in arts if a.endswith("_original_sizes.json")][0]
        with open(os.path.join(out_dirs[0], one)) as f:
            print("size record:", json.dumps(json.load(f)))
    finally:
        engine.cleanup_resources()
    return 0


if __name__ == "__main__":
    sys.exit(main())
