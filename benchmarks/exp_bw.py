#!/usr/bin/env python
"""HBM bandwidth through different Pallas block modes (copy kernels)."""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

try:
    _Element = pl.Element
except AttributeError:
    from jax._src.pallas.core import Element as _Element


def sync(out):
    return float(jax.device_get(out.reshape(-1)[:1])[0])


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


B, H, W2, K = 32, 512, 256, 128
GB = B * (H + 2) * (W2 + 1) * K * 2 / 1e9   # input bytes
GBO = B * H * W2 * K * 2 / 1e9


def copy_elem(TH):
    n_h = H // TH

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[0, 1:1 + TH, 0:W2, :]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B * n_h,),
            in_specs=[pl.BlockSpec(
                (_Element(1), _Element(TH + 2), _Element(W2 + 1), _Element(K)),
                lambda i: (i // n_h, (i % n_h) * TH, 0, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (None, TH, W2, K), lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W2, K), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)
    return run


def copy_blocked(TH):
    n_h = H // TH

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[0, :, 0:W2, :]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B * n_h,),
            in_specs=[pl.BlockSpec(
                (1, TH, W2 + 1, K),
                lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (None, TH, W2, K), lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W2, K), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)
    return run


def main():
    x = jax.random.normal(jax.random.key(0), (B, H + 2, W2 + 1, K),
                          jnp.bfloat16)

    @jax.jit
    def xla_copy(x):
        return x[:, 1:1 + H, 0:W2, :] * 1.0001

    ms = timeit(xla_copy, (x,)) * 1e3
    print(f"xla slice-copy      : {ms:7.2f} ms  {(GB+GBO)/ms*1e3:6.0f} GB/s")

    for TH in (8, 16, 32, 64):
        ms = timeit(copy_elem(TH), (x,)) * 1e3
        print(f"pallas Element TH={TH:3d}: {ms:7.2f} ms  {(GB+GBO)/ms*1e3:6.0f} GB/s")
    for TH in (8, 16, 32, 64):
        ms = timeit(copy_blocked(TH), (x,)) * 1e3
        print(f"pallas Blocked TH={TH:3d}: {ms:7.2f} ms  {(GB+GBO)/ms*1e3:6.0f} GB/s")


if __name__ == "__main__":
    main()
