#!/usr/bin/env python
"""Sanitizer drive for every libunetseg_host entry point (no jax imports —
XLA's allocator conflicts with sanitizer preloads).

Run via ``make -C csrc sanitize`` (builds ASan + UBSan instrumented
copies of the library and pushes adversarial inputs through cleanup
(plain + 2-bit packed), the Suzuki-Abe tracer, per-class extraction,
both JSON emitters, the bit-exact preprocess (incl. the flat-image and
same-size LUT edges) and the full-tier batched artifact emitter).
First run 2026-08-18: clean under both sanitizers (RESULTS_r4.md §10).
"""
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from unetseg_tpu.io import native  # noqa: E402

if len(sys.argv) > 1:
    native._LIB_PATH = sys.argv[1]  # instrumented library
assert native.available(), "native library failed to load"

rng = np.random.default_rng(0)
tmp = "/tmp/unetseg_sanitize_artifacts"
shutil.rmtree(tmp, ignore_errors=True)
os.makedirs(tmp)


def masks_zoo(n, s):
    out = []
    for i in range(n):
        kind = i % 7
        m = np.zeros((s, s), np.uint8)
        if kind == 0:   # random speckle
            m = (rng.random((s, s)) < 0.3).astype(np.uint8) * 2
        elif kind == 1:  # all-foreground
            m[:] = 2
        elif kind == 2:  # stripes
            m[::2] = 2
        elif kind == 3:  # blobs
            for _ in range(12):
                cy, cx = rng.integers(0, s, 2)
                r = int(rng.integers(1, s // 4))
                yy, xx = np.ogrid[:s, :s]
                m[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 2
        elif kind == 4:  # 1px frame
            m[0] = m[-1] = m[:, 0] = m[:, -1] = 2
        elif kind == 5:  # all three classes
            m = rng.integers(0, 3, (s, s)).astype(np.uint8)
        # kind 6: empty
        out.append(m)
    return np.stack(out)


for s in (16, 64, 512, 61):  # 61: odd size (packed path requires % 4)
    ms = masks_zoo(14, s)
    cleaned = native.postprocess_batch(ms)
    assert cleaned.shape == ms.shape
    if s % 4 == 0:
        packed = np.zeros((14, s, s // 4), np.uint8)
        for j in range(4):
            packed |= (ms[..., j::4] & 3) << (2 * j)
        c2 = native.postprocess_packed_batch(packed, s)
        assert np.array_equal(c2, cleaned)
    for m in ms:
        vis = np.where(m == 2, 255, np.where(m == 1, 128, 0)).astype(np.uint8)
        cs = native.extract_contours(vis)
        if cs:
            native.contour_json_bytes(cs, "x", s * 2, s * 2, 2.0, 2.0)
        pc = native.contours_per_class(m)
        labeled = [(cls, i, c)
                   for i, (cls, cc) in enumerate(sorted(pc.items()))
                   for c in cc]
        native.contour_json_bytes_labeled(labeled, "x", s, s, 1.0, 1.0)
    for (h, w) in ((s, s), (s * 2, s), (7, 513)):
        raw = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        native.preprocess_u8(raw, max(s, 16))
        flat = np.full((h, w), 777, np.uint16)  # mn == mx edge
        native.preprocess_u8(flat, 16)
        # saturated mn == mx == 65535: must widen to int, not wrap uint16
        # (previously aborted via a 2^64-sized LUT on the same-size path;
        # round-4 review finding) — drive BOTH the LUT and general paths
        sat = np.full((h, w), 65535, np.uint16)
        native.preprocess_u8(sat, h if h == w else 16)
        native.preprocess_u8(sat, 16)
    # degenerate zero-area input: guarded zero fill, not an OOB read
    assert (native.preprocess_u8(np.zeros((0, 16), np.uint16), 16) == 0).all()
    if s % 4 == 0:
        u8 = rng.integers(0, 256, (14, s, s)).astype(np.uint8)
        counts = native.emit_batch(u8, cleaned, [tmp] * 14,
                                   [f"a{i}" for i in range(14)],
                                   [f"a{i}.raw" for i in range(14)],
                                   s, s, native.TIER_FULL)
        assert (counts >= 0).all()
    print(f"size {s} ok", flush=True)
print("SANITIZE DRIVE COMPLETE")
