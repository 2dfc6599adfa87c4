#!/usr/bin/env python
"""Study-pipeline overlap scaling (VERDICT r1 item 6).

Sweeps loader/emitter thread counts for a synthetic 300-slice study and
reports wall slices/s vs the pure device rate.  Measured finding (RESULTS_r2.md):
on this box the serial resource is the tunneled H2D path (0.04 GB/s) — more
threads HURT (contention + GIL), and the wall rate is transfer-bound at
~18 slices/s regardless of thread count. On production hosts (PCIe >=10
GB/s, ~14 cores/chip) the loader/emitter pools are the scaling lever this
flag sweep exercises.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import unet
    from unetseg_tpu.parallel import pipeline

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    w = h = 512

    cfg = ModelConfig()
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)

    tmp = tempfile.mkdtemp(prefix="study_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = os.path.join(tmp, f"s{i:04d}.raw")
        rng.integers(0, 65536, size=(h, w), dtype=np.uint16).tofile(p)
        paths.append(p)

    # device-only rate (no postprocess/emit): upper bound
    r0 = pipeline.run_study(params, cfg, paths, w, h, emit=None,
                            loader_threads=4)
    print(f"device-rate run (emit=None, cleanup in drain): "
          f"{r0.slices_per_sec:.1f} slices/s wall")

    sink = [0]

    def emit_trivial(k, path, mask):
        sink[0] += int(mask[0, 0])

    for lt, et in [(1, 1), (2, 2), (4, 4), (8, 8), (4, 12)]:
        t0 = time.perf_counter()
        r = pipeline.run_study(params, cfg, paths, w, h, emit=emit_trivial,
                               loader_threads=lt, emitter_threads=et)
        print(f"loaders={lt:2d} emitters={et:2d}: {r.slices_per_sec:8.1f} "
              f"slices/s wall  ({time.perf_counter()-t0:.1f}s)")

    for p in paths:
        os.unlink(p)


if __name__ == "__main__":
    main()
