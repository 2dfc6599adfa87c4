#!/usr/bin/env python
"""Full-pipeline variants: quantify each optimization candidate in-model.

V0 baseline (current production program), then one change at a time:
  V1 reshape-GEMM upconv (replaces lax.conv_transpose)
  V2 bf16 argmax (no f32 logits round-trip)
  V3 fold2-W stride-2 conv trick on the 512^2 64-ch convs
  V4 all of the above
  V5 truncated: encoder starts at 256^2 (512^2 levels free) — upper bound
  V6 V4 at batch 64
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.ops import preprocess

DN = ("NHWC", "HWIO", "NHWC")


def sync(out):
    flat = out.reshape(-1)
    return float(jax.device_get(flat[:1])[0])


def timeit(fn, args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def conv(x, p, dtype):
    w = p["w"].astype(dtype)
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN)
    return y + p["b"].astype(dtype)


def crelu(x, p, dtype):
    return jax.nn.relu(conv(x, p, dtype))


def crelu_fold2(x, p, dtype):
    """3x3 SAME conv+relu via the stride-2 (3,4)-kernel 2-col fold."""
    B, H, W, C = x.shape
    w = p["w"].astype(dtype)
    D = w.shape[-1]
    w2 = jnp.zeros((3, 4, C, 2 * D), dtype)
    w2 = w2.at[:, 0:3, :, :D].set(w)
    w2 = w2.at[:, 1:4, :, D:].set(w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(xp, w2, (1, 2), "VALID", dimension_numbers=DN)
    y = jax.nn.relu(y + jnp.tile(p["b"].astype(dtype), 2))
    return y.reshape(B, H, W, D)


def up_ct(x, p, dtype):
    w = p["w"].astype(dtype)
    return lax.conv_transpose(x, w, (2, 2), "VALID", dimension_numbers=DN) \
        + p["b"].astype(dtype)


def up_gemm(x, p, dtype):
    """2x2 stride-2 transposed conv as one GEMM + lane-contiguous reshapes.

    out[b, 2y+a, 2x+c2, d] = sum_c x[b,y,x,c] W[a,c2,c,d]: two dots (one per
    output-row parity a) with N = (c2, d) so the minor reshape to (2W, D) is
    contiguous; the two row-planes interleave via stack+reshape.
    """
    B, H, W, C = x.shape
    w = p["w"].astype(dtype)  # (2, 2, C, D)
    D = w.shape[-1]
    xm = x.reshape(B * H * W, C)
    planes = []
    for a in range(2):
        # conv_transpose applies the kernel flipped: out[2y+a,2x+b] uses
        # w[1-a, 1-b]
        wa = w[1 - a][::-1].transpose(1, 0, 2).reshape(C, 2 * D)  # (C,(c2,d))
        ya = jnp.dot(xm, wa, preferred_element_type=jnp.float32)
        planes.append(ya.astype(dtype).reshape(B, H, 2 * W, D))
    y = jnp.stack(planes, axis=2).reshape(B, 2 * H, 2 * W, D)
    return y + p["b"].astype(dtype)


def build_apply(cfg, *, fold2=False, upg=False, bf16_argmax=False,
                truncate=False):
    dtype = jnp.dtype(cfg.compute_dtype)

    def pipeline(params, u8):
        x = preprocess.model_input_from_u8(u8)[..., None].astype(dtype)
        skips = []
        for li, stage in enumerate(params["encoder"]):
            hi_res = x.shape[1] == 512
            if truncate and hi_res:
                # pretend the level is free: pool input, fake 64ch skip
                skips.append(jnp.zeros(x.shape[:3] + (64,), dtype))
                x = jnp.zeros(
                    (x.shape[0], x.shape[1] // 2, x.shape[2] // 2, 64), dtype)
                continue
            def cr(x_, p_):
                use_fold = fold2 and hi_res and p_["w"].shape[2] >= 64
                return (crelu_fold2 if use_fold else crelu)(x_, p_, dtype)

            x = cr(x, stage["conv1"])
            x = cr(x, stage["conv2"])
            skips.append(x)
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        x = crelu(x, params["bottleneck"]["conv1"], dtype)
        x = crelu(x, params["bottleneck"]["conv2"], dtype)
        for stage, skip in zip(params["decoder"], reversed(skips)):
            up = up_gemm if upg else up_ct
            x = up(x, stage["up"], dtype)
            hi_res = x.shape[1] == 512
            if truncate and hi_res:
                break
            x = jnp.concatenate([skip, x], axis=-1)
            cr2 = crelu_fold2 if (fold2 and hi_res) else crelu
            x = cr2(x, stage["conv1"], dtype)
            x = cr2(x, stage["conv2"], dtype)
        logits = conv(x, params["head"], dtype) if not truncate else x[..., :3]
        if bf16_argmax:
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.uint8)

    return jax.jit(pipeline)


def main():
    cfg = ModelConfig()
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)

    def run(name, b, **kw):
        u8 = jnp.asarray(rng.integers(0, 256, size=(b, 512, 512), dtype=np.uint8))
        fn = build_apply(cfg, **kw)
        ms = timeit(fn, (params, u8)) * 1e3
        print(f"{name:28s} {ms:8.1f} ms  {b/ms*1e3:7.1f} slices/s")
        return ms

    run("V0 baseline", 32)
    run("V1 up_gemm", 32, upg=True)
    run("V2 bf16 argmax", 32, bf16_argmax=True)
    run("V3 fold2 512-lvls", 32, fold2=True)
    run("V4 all", 32, upg=True, bf16_argmax=True, fold2=True)
    run("V5 truncate 512-lvls", 32, truncate=True, upg=True, bf16_argmax=True)
    run("V6 V4 batch64", 64, upg=True, bf16_argmax=True, fold2=True)
    run("V7 V0 batch64", 64)


if __name__ == "__main__":
    main()
