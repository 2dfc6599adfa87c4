#!/usr/bin/env python
"""int8 dot_general micro-benchmark at the slim4 conv GEMM shapes.

VERDICT r3 item 7: before building (or retiring) a Pallas int8 conv, pin
down whether int8 `dot_general` even beats bf16 at the K the slim4 geometry
can feed it:

* fold2 layout (ops/fold_conv.py, pruned round 5 — see PERFORMANCE.md
  memo): per-tap dots of K = 2C, N = 2D —
  K=128/N=128 at the 64-channel level;
* full im2col: K = 9C (576 at 64ch, 1152 at 128ch);
* large-K reference point (K=4096) where round 1 measured the 200+ TOPS
  int8 rate.

M is sized to the slim4 batch-128 serving reality (128 slices x 128² / 2
folded columns).  If int8 at the feedable K's is NOT materially faster than
bf16, the conv kernel cannot win end-to-end (operand assembly + converts
come on top) and the retirement memo follows from measurement.

Usage: python benchmarks/exp_int8_dot.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def bench(m, k, n, dtype, iters=30):
        if dtype == "int8":
            a = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
            b = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))
            f = jax.jit(lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
        else:
            a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
            f = jax.jit(lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        out = f(a, b)
        _ = int(out[0, 0])  # sync (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(a, b)
        _ = int(out[0, 0])
        dt = (time.perf_counter() - t0) / iters
        tops = 2 * m * k * n / dt / 1e12
        return dt * 1e3, tops

    # slim4 serving batch 128: M = 128 slices * 128*64 folded positions
    M = 128 * 128 * 64
    shapes = [
        ("fold2 64ch  K=128  N=128", M, 128, 128),
        ("im2col 64ch K=576  N=64", 128 * 128 * 128, 576, 64),
        ("im2col 128ch K=1152 N=128", 128 * 64 * 64, 1152, 128),
        ("bottleneck K=2304 N=256", 128 * 32 * 32, 2304, 256),
        ("large-K ref K=4096 N=512", 65536, 4096, 512),
    ]
    print(f"{'shape':28s} {'bf16 ms':>9s} {'bf16 TF/s':>10s} "
          f"{'int8 ms':>9s} {'int8 TOPS':>10s} {'ratio':>6s}")
    for name, m, k, n in shapes:
        ms_b, tf_b = bench(m, k, n, "bf16")
        ms_i, tf_i = bench(m, k, n, "int8")
        print(f"{name:28s} {ms_b:9.3f} {tf_b:10.1f} {ms_i:9.3f} "
              f"{tf_i:10.1f} {ms_b/ms_i:6.2f}x", flush=True)


if __name__ == "__main__":
    main()
