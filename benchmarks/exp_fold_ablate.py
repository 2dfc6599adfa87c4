#!/usr/bin/env python
"""Localize the fold2 kernel stall: ablate window shifts / dots / tile size."""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
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


def make(variant, TH, B=32, H=512, W2=256, K=128, ND=128):
    n_h = H // TH

    def kernel(x_ref, wlo_ref, whi_ref, out_ref):
        a = jnp.zeros((TH * W2, ND), jnp.float32)
        for dy in range(3):
            if variant == "full":          # production: lo + hi windows
                lo = x_ref[0, dy:dy + TH, 0:W2, :].reshape(TH * W2, K)
                hi = x_ref[0, dy:dy + TH, 1:W2 + 1, :].reshape(TH * W2, K)
                pairs = [(lo, wlo_ref), (hi, whi_ref)]
            elif variant == "noshift":     # 6 dots, no sublane offset
                lo = x_ref[0, dy:dy + TH, 0:W2, :].reshape(TH * W2, K)
                pairs = [(lo, wlo_ref), (lo, whi_ref)]
            elif variant == "lo3":         # 3 dots only
                lo = x_ref[0, dy:dy + TH, 0:W2, :].reshape(TH * W2, K)
                pairs = [(lo, wlo_ref)]
            elif variant == "nody":        # 6 dots, no row offset either
                lo = x_ref[0, 0:TH, 0:W2, :].reshape(TH * W2, K)
                pairs = [(lo, wlo_ref), (lo, whi_ref)]
            for xs, wr in pairs:
                a += lax.dot_general(xs, wr[dy], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        out_ref[...] = a.reshape(TH, W2, ND).astype(out_ref.dtype)

    @jax.jit
    def run(xf, wlo, whi):
        return pl.pallas_call(
            kernel,
            grid=(B * n_h,),
            in_specs=[
                pl.BlockSpec(
                    (_Element(1), _Element(TH + 2), _Element(W2 + 1),
                     _Element(K)),
                    lambda i: (i // n_h, (i % n_h) * TH, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((3, K, ND), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, K, ND), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (None, TH, W2, ND),
                lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W2, ND), xf.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(xf, wlo, whi)

    return run


def main():
    B, H, W2, K, ND = 32, 512, 256, 128, 128
    k = jax.random.key(0)
    xf = jax.random.normal(k, (B, H + 2, W2 + 1, K), jnp.bfloat16)
    wlo = jax.random.normal(k, (3, K, ND), jnp.bfloat16) * 0.1
    whi = jax.random.normal(k, (3, K, ND), jnp.bfloat16) * 0.1

    for variant in ("full", "noshift", "lo3", "nody"):
        for TH in (8, 16, 32):
            fn = make(variant, TH)
            ms = timeit(fn, (xf, wlo, whi)) * 1e3
            ndots = 3 if variant == "lo3" else 6
            fl = 2 * B * H * W2 * ndots * K * ND
            print(f"{variant:8s} TH={TH:2d}: {ms:8.2f} ms  "
                  f"{fl/ms/1e9:6.1f} TF/s(raw-dots)")


if __name__ == "__main__":
    main()


def make_ndots(ndots, TH, B=32, H=512, W2=256, K=128, ND=128):
    """Same traffic, n× compute: measures sustainable in-kernel dot rate."""
    n_h = H // TH

    def kernel(x_ref, wlo_ref, whi_ref, out_ref):
        a = jnp.zeros((TH * W2, ND), jnp.float32)
        lo = x_ref[0, 1:1 + TH, 0:W2, :].reshape(TH * W2, K)
        hi = x_ref[0, 1:1 + TH, 1:W2 + 1, :].reshape(TH * W2, K)
        for i in range(ndots):
            wr = (wlo_ref, whi_ref)[i % 2]
            a += lax.dot_general((lo, hi)[i % 2], wr[i % 3],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[...] = a.reshape(TH, W2, ND).astype(out_ref.dtype)

    @jax.jit
    def run(xf, wlo, whi):
        return pl.pallas_call(
            kernel,
            grid=(B * n_h,),
            in_specs=[
                pl.BlockSpec(
                    (_Element(1), _Element(TH + 2), _Element(W2 + 1),
                     _Element(K)),
                    lambda i: (i // n_h, (i % n_h) * TH, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((3, K, ND), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, K, ND), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (None, TH, W2, ND), lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W2, ND), xf.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(xf, wlo, whi)
    return run


def main2():
    B, H, W2, K, ND = 32, 512, 256, 128, 128
    k = jax.random.key(0)
    xf = jax.random.normal(k, (B, H + 2, W2 + 1, K), jnp.bfloat16)
    wlo = jax.random.normal(k, (3, K, ND), jnp.bfloat16) * 0.1
    whi = jax.random.normal(k, (3, K, ND), jnp.bfloat16) * 0.1
    prev = None
    for nd in (6, 12, 24, 48):
        fn = make_ndots(nd, 16)
        ms = timeit(fn, (xf, wlo, whi)) * 1e3
        fl = 2 * B * H * W2 * nd * K * ND
        marg = ""
        if prev is not None:
            dfl = 2 * B * H * W2 * (nd - prev[0]) * K * ND
            marg = f"  marginal {dfl/(ms-prev[1])/1e9:6.1f} TF/s"
        print(f"ndots={nd:3d}: {ms:8.2f} ms  {fl/ms/1e9:6.1f} TF/s{marg}")
        prev = (nd, ms)


if __name__ == "__main__":
    pass


def make_ndots_u(ndots, TH, B=32, H=512, W2=256, K=128, ND=128):
    """Unique weight per dot (defeats CSE): true sustainable dot rate."""
    n_h = H // TH

    def kernel(x_ref, w_ref, out_ref):
        a = jnp.zeros((TH * W2, ND), jnp.float32)
        lo = x_ref[0, 1:1 + TH, 0:W2, :].reshape(TH * W2, K)
        hi = x_ref[0, 1:1 + TH, 1:W2 + 1, :].reshape(TH * W2, K)
        for i in range(ndots):
            a += lax.dot_general((lo, hi)[i % 2], w_ref[i],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[...] = a.reshape(TH, W2, ND).astype(out_ref.dtype)

    @jax.jit
    def run(xf, w):
        return pl.pallas_call(
            kernel,
            grid=(B * n_h,),
            in_specs=[
                pl.BlockSpec(
                    (_Element(1), _Element(TH + 2), _Element(W2 + 1),
                     _Element(K)),
                    lambda i: (i // n_h, (i % n_h) * TH, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((ndots, K, ND), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (None, TH, W2, ND), lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W2, ND), xf.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(xf, w)
    return run


def main3():
    B, H, W2, K, ND = 32, 512, 256, 128, 128
    k = jax.random.key(0)
    xf = jax.random.normal(k, (B, H + 2, W2 + 1, K), jnp.bfloat16)
    prev = None
    for nd in (6, 12, 24, 48):
        w = jax.random.normal(k, (nd, K, ND), jnp.bfloat16) * 0.1
        fn = make_ndots_u(nd, 16)
        ms = timeit(fn, (xf, w)) * 1e3
        fl = 2 * B * H * W2 * nd * K * ND
        marg = ""
        if prev is not None:
            dfl = 2 * B * H * W2 * (nd - prev[0]) * K * ND
            marg = f"  marginal {dfl/(ms-prev[1])/1e9:6.1f} TF/s"
        print(f"ndots={nd:3d}: {ms:8.2f} ms  {fl/ms/1e9:6.1f} TF/s{marg}")
        prev = (nd, ms)
