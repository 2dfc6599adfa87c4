#!/usr/bin/env python
"""Train the flagship 512² UNet on synthetic CT-like data (VERDICT r1 #4).

Produces ``models/flagship_synth.ckpt`` (inference bundle, params stored
float16 for repo size; compute casts to bf16 anyway) and prints train/val
metrics.  The reference ships no weights (its .pt/.onnx/.trt are gitignored,
/root/reference/.gitignore:2-7), so the synthetic task stands in as the
framework's accuracy demonstration: bench.py reports foreground IoU on
held-out slices from the same generator.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from unetseg_tpu import checkpoint, data, train
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import registry as model_registry

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch = 8
    n_train = 128

    cfg = ModelConfig(remat=True)
    tx = train.make_optimizer(lr=3e-4, total_steps=steps)
    state = train.init_state(jax.random.key(0), cfg, tx)

    rng = np.random.default_rng(42)
    t0 = time.time()
    imgs, labels = data.training_batch(rng, n_train)
    print(f"data gen: {time.time()-t0:.1f}s for {n_train} slices", flush=True)

    import functools
    step_fn = jax.jit(functools.partial(train.train_step, cfg=cfg, tx=tx),
                      donate_argnums=(0,))

    order = np.arange(n_train)
    t0 = time.time()
    for s in range(steps):
        if s % (n_train // batch) == 0:
            rng.shuffle(order)
        idx = order[(s * batch) % n_train:(s * batch) % n_train + batch]
        bi = jnp.asarray(imgs[idx])
        bl = jnp.asarray(labels[idx])
        state, loss = step_fn(state, (bi, bl))
        if s % 25 == 0 or s == steps - 1:
            print(f"step {s:4d} loss {float(loss):.4f} "
                  f"({(time.time()-t0)/(s+1)*1e3:.0f} ms/step)", flush=True)

    # evaluate on held-out slices
    from unetseg_tpu import metrics

    val_rng = np.random.default_rng(1234)
    vi, vl = data.training_batch(val_rng, 16)

    @jax.jit
    def predict(params, x):
        logits = model_registry.apply(params, x, cfg)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    pred = np.asarray(predict(state.params, jnp.asarray(vi)))
    fg_iou = float(np.mean([
        metrics.foreground_iou(pred[i], vl[i]) for i in range(len(vl))
    ]))
    print(f"val foreground IoU (argmax, no postprocess): {fg_iou:.4f}")

    out = os.path.join(os.path.dirname(__file__), "..", "models",
                       "flagship_synth.ckpt")
    out = os.path.abspath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    params_f16 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16), jax.device_get(state.params))
    checkpoint.save(out, params_f16, ModelConfig())  # serve-config (no remat)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
