#!/usr/bin/env python
"""Serving-daemon demo: start the TCP service, drive it like a client.

    python examples/service_client.py --out /tmp/unetseg_service_demo

Starts ``SegmentationService`` in-process (production: run
``python -m unetseg_tpu --serve 8473`` in its own process/container),
initializes it with a fresh checkpoint, submits a single slice and a
directory, and prints the JSON responses.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unetseg_service_demo")
    args = ap.parse_args()

    from unetseg_tpu import checkpoint, service
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.io import raw as raw_io

    out = args.out
    os.makedirs(f"{out}/engine", exist_ok=True)
    os.makedirs(f"{out}/data", exist_ok=True)
    ckpt = f"{out}/engine/model.ckpt"
    # small model for the demo; swap in models/flagship_synth.ckpt for 512²
    checkpoint.create(ckpt, ModelConfig(base_channels=8, depth=2,
                                        image_size=64,
                                        compute_dtype="float32"))
    rng = np.random.default_rng(0)
    for i in range(4):
        raw_io.write_raw(f"{out}/data/slice{i}.raw",
                         rng.integers(0, 65536, (70, 90), np.uint16))

    svc = service.SegmentationService(port=0)
    addr = svc.start()
    print(f"service on {addr[0]}:{addr[1]}")
    try:
        for req in (
            {"cmd": "status"},
            {"cmd": "init", "cache": ckpt},
            {"cmd": "process", "path": f"{out}/data/slice0.raw",
             "width": 90, "height": 70, "output_dir": f"{out}/single"},
            {"cmd": "process", "path": f"{out}/data", "width": 90,
             "height": 70, "output_dir": f"{out}/batch"},
            {"cmd": "status"},
        ):
            print(f">>> {req}")
            print(f"<<< {service.request(addr, req)}")
    finally:
        svc.stop()
    print(f"artifacts under {out}/single and {out}/batch")
    return 0


if __name__ == "__main__":
    sys.exit(main())
