#!/usr/bin/env python
"""Profile the all-device postprocess program component by component.

VERDICT r3 target (item 4): batched device postprocess <= ~3 ms/mask so the
all-device serving mode (engine device_postprocess=True) stops being a 7x
regression vs the 1 ms/mask host C++ path.  This experiment times, at batch
32 on the real chip: the Pallas CCL, the pixel-granularity scatter stats
(cc.cc_stats / cc_area), the table gathers, the morphology, and the full
fused program — to locate where the ~20 ms/mask actually goes.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

from unetseg_tpu.data import synth_batch
from unetseg_tpu.ops import cc, morphology, postprocess
from unetseg_tpu.ops.cc_pallas import cc_label_pallas

B, S = 32, 512
rng = np.random.default_rng(0)
_, labels = synth_batch(rng, B, S)          # (B, S, S) class masks {0,1,2}
masks = jnp.asarray(labels.astype(np.uint8))
fg = masks == 2

def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:1]), out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:1]), out)
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[2] * 1e3
    print(f"{name:42s} {ms:8.2f} ms/b{B}  ({ms/B:6.3f} ms/mask)", flush=True)
    return out

lbl = timeit("ccl pallas (batch grid)", jax.jit(cc_label_pallas), fg)

timeit("cc_stats (5 scatters/mask)",
       jax.jit(jax.vmap(cc.cc_stats)), fg, lbl)
timeit("cc_area (1 scatter-add/mask)",
       jax.jit(jax.vmap(cc.cc_area)), fg, lbl)

@jax.jit
def gathers(fg, lbl):
    def one(fg, lbl):
        tbl = jnp.zeros((S * S + 1,), jnp.bool_)
        return tbl[lbl.reshape(-1)].reshape(S, S) & fg
    return jax.vmap(one)(fg, lbl)
timeit("table gather (1/mask)", gathers, fg, lbl)

timeit("morphology open 3x3",
       jax.jit(jax.vmap(lambda m: morphology.open_(m, 3))), fg)

timeit("FULL postprocess_batch (pallas cc)",
       lambda m: postprocess.postprocess_batch(m, use_pallas_cc=True), masks)
timeit("FULL postprocess_batch (xla cc)",
       lambda m: postprocess.postprocess_batch(m, use_pallas_cc=False), masks)

# v3 fast path (scatter-lean: 1 area scatter + border scatter + min-prop
# predicate broadcast per CC stage) — the row that matters
timeit("FULL postprocess_batch v3 (pallas fast)",
       lambda m: postprocess.postprocess_batch(m, use_pallas_cc=True), masks)

# ---- v4: slot-compressed stats, scatter-free (round 4) --------------------
timeit("FULL postprocess_batch_v4 (slots)",
       lambda m: postprocess.postprocess_batch_v4(m), masks)
