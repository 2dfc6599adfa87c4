#!/usr/bin/env python
"""Serving cost of the cascade routers at the production batch size.

Three programs, same serving checkpoint, batch 128, timed on-chip with the
dispatch-amortized queue-N-sync-once protocol (CLAUDE.md):

  plain     — normalize -> UNet -> argmax (the serving program)
  margin    — + boundary-margin conf (top-2 + two reduce_windows + scalar)
  disagree  — + full co-student pass + pixel-mismatch count
  both      — + co-student pass + mismatch count + margin (union router)

Usage: python benchmarks/exp_cascade_cost.py [batch] [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    mdir = os.path.join(REPO, "models")
    params, cfg = checkpoint.load(os.path.join(mdir, "flagship_slim4.ckpt"))
    co_params, co_cfg = checkpoint.load(
        os.path.join(mdir, "flagship_slim4_robust.ckpt"))

    eng = engine.InferenceEngine(params, cfg)
    u8 = np.random.default_rng(0).integers(
        0, 256, (batch, 512, 512)).astype(np.uint8)
    shape = jax.ShapeDtypeStruct((batch, 512, 512), jnp.uint8)

    margin = jax.jit(eng._pipeline_conf).lower(eng.params, shape).compile()
    # attach through the public API so co_params get the engine's own
    # mesh-aware placement — hand-poking _cascade_co_params skipped
    # _place() and gave the fused router inconsistently-placed operands on
    # multi-device engines (round-4 review finding); fb unused for timing
    eng.attach_cascade(params, cfg, router="both",
                       co_params=co_params, co_cfg=co_cfg)
    disagree = jax.jit(eng._pipeline_disagree).lower(
        eng.params, eng._cascade_co_params, shape).compile()
    both = jax.jit(eng._pipeline_both).lower(
        eng.params, eng._cascade_co_params, shape).compile()

    u8_d = jax.device_put(u8, eng._device)

    def timeit(name, fn, nargs):
        args = (eng.params, u8_d) if nargs == 2 else \
            (eng.params, eng._cascade_co_params, u8_d)
        out = fn(*args)   # warm
        first = out[0] if isinstance(out, tuple) else out
        _ = int(np.asarray(first[0, 0, 0]))   # sync (tunnel-safe)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]   # queue all dispatches
        last = outs[-1][0] if isinstance(outs[-1], tuple) else outs[-1]
        _ = int(np.asarray(last[0, 0, 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:9s} {dt*1e3:8.2f} ms/batch  "
              f"{batch/dt:8.1f} slices/s")
        return dt

    # NOTE: plain's executable donates the input; re-put each iter would
    # skew timing, so run plain via a non-donating jit for apples-to-apples
    plain_nd = jax.jit(eng._pipeline).lower(eng.params, shape).compile()
    t_plain = timeit("plain", plain_nd, 2)
    t_margin = timeit("margin", margin, 2)
    t_dis = timeit("disagree", disagree, 3)
    t_both = timeit("both", both, 3)
    print(f"\nmargin overhead  {100*(t_margin/t_plain-1):+.1f}%   "
          f"disagree overhead {100*(t_dis/t_plain-1):+.1f}%   "
          f"both overhead {100*(t_both/t_plain-1):+.1f}%")


if __name__ == "__main__":
    main()
