#!/usr/bin/env python
"""Round-2 per-op profiling on the real chip.

Times each UNet stage shape in isolation (pipelined dispatches, element-fetch
sync — see CLAUDE.md on the tunneled backend) to find where the batch-32
512² pipeline's ~100 ms actually goes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def sync(out):
    # Fetch ONE element (sliced on device): device_get of a big tensor pulls
    # it all through the tunnel (~seconds); block_until_ready is unreliable.
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


def conv_ms(b, h, cin, cout, iters=10):
    k = jax.random.key(0)
    x = jax.random.normal(k, (b, h, h, cin), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, cin, cout), jnp.bfloat16)
    bias = jnp.zeros((cout,), jnp.bfloat16)

    @jax.jit
    def f(x, w, bias):
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN)
        return jax.nn.relu(y + bias)

    dt = timeit(f, (x, w, bias), iters)
    fl = 2 * b * h * h * 9 * cin * cout
    return dt * 1e3, fl / dt / 1e12


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"batch={b} backend={jax.devices()[0].platform}")

    # UNet stage shapes: (H, Cin, Cout, count-per-image) for 3x3 convs
    shapes = [
        ("enc1a 512 1->64   ", 512, 1, 64),
        ("enc1b 512 64->64  ", 512, 64, 64),
        ("enc2  256 64->128 ", 256, 64, 128),
        ("enc2b 256 128->128", 256, 128, 128),
        ("enc3  128 128->256", 128, 128, 256),
        ("enc3b 128 256->256", 128, 256, 256),
        ("enc4  64  256->512", 64, 256, 512),
        ("enc4b 64  512->512", 64, 512, 512),
        ("botl  32  512->1024", 32, 512, 1024),
        ("botlb 32 1024->1024", 32, 1024, 1024),
        ("dec4a 64 1024->512 ", 64, 1024, 512),
        ("dec3a 128 512->256 ", 128, 512, 256),
        ("dec2a 256 256->128 ", 256, 256, 128),
        ("dec1a 512 128->64  ", 512, 128, 64),
        ("dec1b 512 64->64   ", 512, 64, 64),
    ]
    total = 0.0
    for name, h, cin, cout in shapes:
        ms, tf = conv_ms(b, h, cin, cout)
        total += ms
        print(f"{name} {ms:8.2f} ms  {tf:6.1f} TF/s")
    print(f"[3x3 convs, one each: {total:.1f} ms] (model has conv2 x2 per lvl)")

    # upsamplers
    k = jax.random.key(0)
    for h, cin in [(32, 1024), (64, 512), (128, 256), (256, 128)]:
        x = jax.random.normal(k, (b, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(k, (2, 2, cin, cin // 2), jnp.bfloat16)

        @jax.jit
        def up(x, w):
            return lax.conv_transpose(x, w, (2, 2), "VALID", dimension_numbers=DN)

        ms = timeit(up, (x, w)) * 1e3
        fl = 2 * b * (2 * h) ** 2 * cin * (cin // 2)
        print(f"up {h}->{2*h} {cin}ch {ms:8.2f} ms  {fl/ms*1e3/1e12:6.1f} TF/s")

    # pool + head + argmax + normalize
    x = jax.random.normal(k, (b, 512, 512, 64), jnp.bfloat16)

    @jax.jit
    def pool(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    print(f"pool 512 64ch  {timeit(pool, (x,))*1e3:8.2f} ms")

    wh = jax.random.normal(k, (1, 1, 64, 3), jnp.bfloat16)

    @jax.jit
    def head_argmax(x, wh):
        y = lax.conv_general_dilated(x, wh, (1, 1), "SAME", dimension_numbers=DN)
        return jnp.argmax(y.astype(jnp.float32), axis=-1).astype(jnp.uint8)

    print(f"head+argmax    {timeit(head_argmax, (x, wh))*1e3:8.2f} ms")

    u8 = jnp.zeros((b, 512, 512), jnp.uint8)

    @jax.jit
    def norm(u8):
        return u8.astype(jnp.float32) / 255.0

    print(f"u8 normalize   {timeit(norm, (u8,))*1e3:8.2f} ms")

    # full model for reference
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import unet

    cfg = ModelConfig()
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)

    @jax.jit
    def full(params, x):
        return jnp.argmax(unet.apply(params, x, cfg), axis=-1).astype(jnp.uint8)

    xin = jax.random.normal(k, (b, 512, 512, 1), jnp.float32)
    ms = timeit(full, (params, xin), iters=10) * 1e3
    print(f"FULL unet+argmax b{b}: {ms:.1f} ms -> {b/ms*1e3:.1f} slices/s")


if __name__ == "__main__":
    main()
