#!/usr/bin/env python
"""Localize dec1 kernel cost: masks / reshapes / up-GEMM / head."""

import sys
import time

import numpy as np
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
    return int(jax.device_get(out.reshape(-1)[:1])[0] * 0 + 1)


def timeit(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


B, H, W2, C2 = 32, 512, 256, 128
TR = 8
n_h = H // TR
WF = W2 + 2


def make(variant, TR=TR, vmem_mb=None):
    n_h = H // TR
    WF = W2 + 2

    def kernel(z_ref, skip_ref, wu_ref, w1lo_ref, w1hi_ref, w2lo_ref,
               w2hi_ref, wh_ref, out_ref):
        r0 = (pl.program_id(0) % n_h) * TR
        Mz = (TR // 2 + 2) * WF
        use_masks = variant not in ("nomask", "min")
        use_up = variant not in ("noup",)
        use_3d = variant == "dot3d"

        if use_up:
            zs = z_ref[0].reshape(Mz, C2)
            planes = []
            for a in range(2):
                pa = lax.dot_general(zs, wu_ref[a], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                planes.append(pa.reshape(TR // 2 + 2, 1, WF, C2))
            up = jnp.concatenate(planes, axis=1).reshape(TR + 4, WF, C2)
            if use_masks:
                row = lax.broadcasted_iota(jnp.int32, (TR + 4, WF, 1), 0)
                fc = lax.broadcasted_iota(jnp.int32, (TR + 4, WF, 1), 1)
                valid = ((r0 - 2 + row) >= 0) & ((r0 - 2 + row) < H) \
                    & (fc >= 1) & (fc <= W2)
                up = jnp.where(valid, up, 0.0)
            up = up.astype(jnp.bfloat16)

        R1 = TR + 2
        M1 = R1 * (W2 + 1)
        if use_3d:
            acc1 = jnp.zeros((R1, W2 + 1, C2), jnp.float32)
        else:
            acc1 = jnp.zeros((M1, C2), jnp.float32)
        for dy in range(3):
            srcs = [(0, skip_ref[0, dy:dy + R1, :, :])]
            if use_up:
                srcs.append((1, up[dy:dy + R1, :, :]))
            for src, rows in srcs:
                if use_3d:
                    a_lo = rows[:, 0:W2 + 1, :]
                    a_hi = rows[:, 1:W2 + 2, :]
                    acc1 += lax.dot_general(
                        a_lo, w1lo_ref[src, dy], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc1 += lax.dot_general(
                        a_hi, w1hi_ref[src, dy], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    a_lo = rows[:, 0:W2 + 1, :].reshape(M1, C2)
                    a_hi = rows[:, 1:W2 + 2, :].reshape(M1, C2)
                    acc1 += lax.dot_general(
                        a_lo, w1lo_ref[src, dy], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc1 += lax.dot_general(
                        a_hi, w1hi_ref[src, dy], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        c1 = jnp.maximum(acc1.reshape(R1, W2 + 1, C2), 0.0)
        if use_masks:
            fc = lax.broadcasted_iota(jnp.int32, (R1, W2 + 1, C2), 1)
            ch = lax.broadcasted_iota(jnp.int32, (R1, W2 + 1, C2), 2)
            row = lax.broadcasted_iota(jnp.int32, (R1, W2 + 1, C2), 0)
            abs_r = r0 - 1 + row
            keep = ((fc > 0) | (ch >= C2 // 2)) \
                & ((fc < W2) | (ch < C2 // 2)) \
                & (abs_r >= 0) & (abs_r < H)
            c1 = jnp.where(keep, c1, 0.0)
        c1 = c1.astype(jnp.bfloat16)

        M2 = TR * W2
        if use_3d:
            acc2 = jnp.zeros((TR, W2, C2), jnp.float32)
        else:
            acc2 = jnp.zeros((M2, C2), jnp.float32)
        for dy in range(3):
            c1r = c1[dy:dy + TR, :, :]
            if use_3d:
                a_lo = c1r[:, 0:W2, :]
                a_hi = c1r[:, 1:W2 + 1, :]
                acc2 += lax.dot_general(
                    a_lo, w2lo_ref[dy], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc2 += lax.dot_general(
                    a_hi, w2hi_ref[dy], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                a_lo = c1r[:, 0:W2, :].reshape(M2, C2)
                a_hi = c1r[:, 1:W2 + 1, :].reshape(M2, C2)
                acc2 += lax.dot_general(
                    a_lo, w2lo_ref[dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc2 += lax.dot_general(
                    a_hi, w2hi_ref[dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        c2 = jnp.maximum(acc2.reshape(M2, C2), 0.0).astype(jnp.bfloat16)

        lg = lax.dot_general(c2, wh_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        l0, l1, l2 = lg[:, 0:2], lg[:, 2:4], lg[:, 4:6]
        best01 = jnp.where(l1 > l0, 1.0, 0.0)
        cls = jnp.where(l2 > jnp.maximum(l0, l1), 2.0, best01)
        out_ref[...] = jnp.concatenate(
            [cls, jnp.zeros((TR * W2, 6), jnp.float32)], axis=1)

    @jax.jit
    def run(z, skip, wu, w1lo, w1hi, w2lo, w2hi, wh):
        return pl.pallas_call(
            kernel,
            grid=(B * n_h,),
            in_specs=[
                pl.BlockSpec(
                    (_Element(1), _Element(TR // 2 + 2), _Element(WF),
                     _Element(C2)),
                    lambda i: (i // n_h, (i % n_h) * (TR // 2), 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (_Element(1), _Element(TR + 4), _Element(WF),
                     _Element(C2)),
                    lambda i: (i // n_h, (i % n_h) * TR, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((2, C2, C2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 3, C2, C2), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 3, C2, C2), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, C2, C2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, C2, C2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C2, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (None, None, TR * W2, 8),
                lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_h, TR * W2, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem_mb * 1024 * 1024 if vmem_mb else None),
        )(z, skip, wu, w1lo, w1hi, w2lo, w2hi, wh)

    return run


def main():
    k = jax.random.key(0)
    z = jax.random.normal(k, (B, 258, 258, C2), jnp.bfloat16)
    skip = jax.random.normal(k, (B, 516, 258, C2), jnp.bfloat16)
    wu = jax.random.normal(k, (2, C2, C2), jnp.bfloat16) * 0.1
    w1lo = jax.random.normal(k, (2, 3, C2, C2), jnp.bfloat16) * 0.1
    w1hi = jax.random.normal(k, (2, 3, C2, C2), jnp.bfloat16) * 0.1
    w2lo = jax.random.normal(k, (3, C2, C2), jnp.bfloat16) * 0.1
    w2hi = jax.random.normal(k, (3, C2, C2), jnp.bfloat16) * 0.1
    wh = jax.random.normal(k, (C2, 8), jnp.bfloat16) * 0.1
    args = (z, skip, wu, w1lo, w1hi, w2lo, w2hi, wh)
    for variant in ("full", "nomask", "noup", "dot3d"):
        try:
            ms = timeit(make(variant), args) * 1e3
            print(f"{variant:8s}: {ms:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{variant:8s}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()


def main_vmem():
    k = jax.random.key(0)
    z = jax.random.normal(k, (B, 258, 258, C2), jnp.bfloat16)
    skip = jax.random.normal(k, (B, 516, 258, C2), jnp.bfloat16)
    wu = jax.random.normal(k, (2, C2, C2), jnp.bfloat16) * 0.1
    w1lo = jax.random.normal(k, (2, 3, C2, C2), jnp.bfloat16) * 0.1
    w1hi = jax.random.normal(k, (2, 3, C2, C2), jnp.bfloat16) * 0.1
    w2lo = jax.random.normal(k, (3, C2, C2), jnp.bfloat16) * 0.1
    w2hi = jax.random.normal(k, (3, C2, C2), jnp.bfloat16) * 0.1
    wh = jax.random.normal(k, (C2, 8), jnp.bfloat16) * 0.1
    args = (z, skip, wu, w1lo, w1hi, w2lo, w2hi, wh)
    for tr, mb in ((8, 64), (16, 64), (32, 100), (64, 120)):
        try:
            ms = timeit(make("full", TR=tr, vmem_mb=mb), args) * 1e3
            print(f"dec1 TR={tr:2d} vmem={mb}MB: {ms:8.1f} ms", flush=True)
        except Exception as e:
            print(f"dec1 TR={tr:2d} vmem={mb}MB: FAIL {str(e)[:140]}", flush=True)
