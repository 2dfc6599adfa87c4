"""ctypes bindings for the host-native C++ library (csrc/libunetseg_host.so).

The reference's host stages are native C++; ours are too.  The library is
built on demand (``make -C csrc``) and loaded lazily; every entry point has a
pure-Python fallback (contours_py / preprocess oracle / jsonfmt) so the
framework degrades gracefully, but the native path is the default.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libunetseg_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None

        lib.utpu_extract_contours.restype = ctypes.c_int
        lib.utpu_extract_contours.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.utpu_free.restype = None
        lib.utpu_free.argtypes = [ctypes.c_void_p]
        lib.utpu_preprocess.restype = None
        lib.utpu_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.utpu_contour_json.restype = ctypes.c_void_p
        lib.utpu_contour_json.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.utpu_size_json.restype = ctypes.c_void_p
        lib.utpu_size_json.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.utpu_contour_json_labeled.restype = ctypes.c_void_p
        lib.utpu_contour_json_labeled.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.utpu_postprocess_batch.restype = None
        lib.utpu_postprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.utpu_postprocess_packed_batch.restype = None
        lib.utpu_postprocess_packed_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.utpu_emit_slice.restype = ctypes.c_int
        lib.utpu_emit_slice.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.utpu_emit_batch.restype = ctypes.c_int
        lib.utpu_emit_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def extract_contours(mask: np.ndarray) -> List[List[Tuple[int, int]]]:
    """Native findContours(EXTERNAL, SIMPLE) parity; see contours_py for spec."""
    lib = load()
    if lib is None:
        from unetseg_tpu.io import contours_py

        return contours_py.extract_contours(mask)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    points = ctypes.POINTER(ctypes.c_int32)()
    offsets = ctypes.POINTER(ctypes.c_int32)()
    n_points = ctypes.c_int32()
    n = lib.utpu_extract_contours(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w,
        ctypes.byref(points), ctypes.byref(offsets), ctypes.byref(n_points),
    )
    if n < 0:
        raise MemoryError("utpu_extract_contours failed")
    try:
        pts = np.ctypeslib.as_array(points, shape=(max(n_points.value, 1), 2))
        offs = np.ctypeslib.as_array(offsets, shape=(n + 1,))
        out = []
        for c in range(n):
            seg = pts[offs[c]: offs[c + 1]]
            out.append([(int(x), int(y)) for x, y in seg])
        return out
    finally:
        lib.utpu_free(points)
        lib.utpu_free(offsets)


def scaled_polygons(mask_vis: np.ndarray, orig_w: int,
                    orig_h: int) -> List[List[Tuple[int, int]]]:
    """Product polygonization: contours of a 0/128/255 mask scaled to the
    original resolution with the reference's TRUNCATING int cast
    (src/mask2polygon.cpp:41-63) — the exact coordinates the engine emits
    into ``{base}.json``.  Single-sourced so benchmarks cannot re-implement
    (and silently diverge from) the product's scaling math (round-4 review
    finding)."""
    sy = orig_h / mask_vis.shape[0]
    sx = orig_w / mask_vis.shape[1]
    return [[(int(x * sx), int(y * sy)) for x, y in c]
            for c in extract_contours(mask_vis)]


def preprocess_u8(raw: np.ndarray, out_size: int = 512) -> np.ndarray:
    """Bit-exact native preprocess; falls back to the NumPy float64 oracle."""
    lib = load()
    if lib is None:
        from unetseg_tpu.ops.preprocess import preprocess_oracle_u8

        return preprocess_oracle_u8(raw, out_size)
    raw = np.ascontiguousarray(raw, dtype=np.uint16)
    h, w = raw.shape
    out = np.empty((out_size, out_size), np.uint8)
    lib.utpu_preprocess(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def postprocess_batch(masks: np.ndarray) -> np.ndarray:
    """Host mask cleanup, exact postprocess.cpp semantics (see ops/postprocess
    for the device twin).  (N, H, W) or (H, W) uint8 -> same shape {0,2}.

    The reference also runs this stage on the host (OpenCV,
    src/postprocess.cpp); union-find CC + 3x3 open are microseconds per image
    in C++, while TPU scatters make the device version ~1000x slower — so the
    production pipeline decodes on device and cleans up here, overlapping with
    the next batch's device work.
    """
    lib = load()
    squeeze = masks.ndim == 2
    m = np.ascontiguousarray(masks[None] if squeeze else masks, dtype=np.uint8)
    n, h, w = m.shape
    if lib is None:
        import jax

        from unetseg_tpu.ops.postprocess import postprocess_mask

        # Prefer the CPU backend for this tiny host-side cleanup, but fall
        # back to whatever backend exists: under JAX_PLATFORMS=axon (the
        # production env) jax.devices("cpu") RAISES, which turned this
        # documented graceful-degradation path into a crash (round-4
        # review finding).
        try:
            dev = jax.devices("cpu")[0]
        except RuntimeError:
            dev = jax.devices()[0]
        with jax.default_device(dev):
            out = np.asarray(jax.vmap(postprocess_mask)(m))
    else:
        out = np.empty_like(m)
        lib.utpu_postprocess_batch(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    return out[0] if squeeze else out


def contour_json_bytes(
    contours: List[List[Tuple[int, int]]],
    base_name: str,
    orig_w: int,
    orig_h: int,
    scale_x: float,
    scale_y: float,
) -> bytes:
    """Native JSON emission with the truncating point scaling fused in."""
    lib = load()
    if lib is None:
        from unetseg_tpu.io import contours_py, jsonfmt

        mapped = contours_py.map_contour_points(contours, scale_x, scale_y)
        return jsonfmt.contour_json_bytes(mapped, base_name, orig_w, orig_h)
    flat = []
    offsets = [0]
    for c in contours:
        flat.extend(c)
        offsets.append(len(flat))
    pts = np.asarray(flat if flat else np.zeros((0, 2)), dtype=np.int32).reshape(-1, 2)
    pts = np.ascontiguousarray(pts)
    offs = np.asarray(offsets, dtype=np.int32)
    out_len = ctypes.c_size_t()
    ptr = lib.utpu_contour_json(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(contours), base_name.encode(), orig_w, orig_h,
        scale_x, scale_y, ctypes.byref(out_len),
    )
    if not ptr:
        raise MemoryError("utpu_contour_json failed")
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.utpu_free(ptr)


def size_json_bytes(filename: str, orig_w: int, orig_h: int,
                    scaled_w: int = 512, scaled_h: int = 512) -> bytes:
    lib = load()
    if lib is None:
        from unetseg_tpu.io import jsonfmt

        return jsonfmt.size_json_bytes(filename, orig_w, orig_h, scaled_w, scaled_h)
    out_len = ctypes.c_size_t()
    ptr = lib.utpu_size_json(filename.encode(), orig_w, orig_h, scaled_w,
                             scaled_h, ctypes.byref(out_len))
    if not ptr:
        raise MemoryError("utpu_size_json failed")
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.utpu_free(ptr)


# Artifact tiers for the batched native emit path (csrc/emit.cpp).  The full
# set (TIER_FULL) is the reference's five per-image artifacts; throughput
# deployments compose smaller tiers (e.g. TIER_MASK_JSON keeps the decisions
# and the polygons, drops the visualization PNGs).
TIER_SIZE_JSON = 1
TIER_CONTOUR_JSON = 2
TIER_MASK_PNG = 4
TIER_NORM_PNG = 8
TIER_OVERLAY_PNG = 16
TIER_FULL = 31
TIER_MASK_JSON = TIER_SIZE_JSON | TIER_CONTOUR_JSON | TIER_MASK_PNG
TIER_JSON = TIER_SIZE_JSON | TIER_CONTOUR_JSON


def emit_slice_available() -> bool:
    return load() is not None


def emit_batch(norm_u8: np.ndarray, clean_masks: np.ndarray,
               out_dirs, base_names, src_filenames,
               orig_w: int, orig_h: int,
               tier: int = TIER_FULL) -> np.ndarray:
    """One C call emitting a batch of slices' artifacts (csrc/emit.cpp).

    ``norm_u8``/``clean_masks``: (n, h, w) uint8 (masks hold class ids, the
    0/128/255 LUT is applied natively).  Per-slice contour counts are
    returned (−1 marks an I/O failure for that slice).  OpenMP fans slices
    over host cores.  Raises RuntimeError when the native library is
    unavailable — callers fall back to the Python emit path.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native emit path requires libunetseg_host.so")
    norm_u8 = np.ascontiguousarray(norm_u8, dtype=np.uint8)
    clean_masks = np.ascontiguousarray(clean_masks, dtype=np.uint8)
    n, h, w = norm_u8.shape
    assert clean_masks.shape == (n, h, w)

    def as_charpp(strs):
        arr = (ctypes.c_char_p * n)()
        arr[:] = [s.encode() for s in strs]
        return arr

    counts = np.empty(n, np.int32)
    lib.utpu_emit_batch(
        norm_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        clean_masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, as_charpp(out_dirs), as_charpp(base_names),
        as_charpp(src_filenames), orig_w, orig_h, tier,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return counts


def postprocess_packed_batch(packed: np.ndarray, width: int) -> np.ndarray:
    """Cleanup from 2-bit-packed masks (n, h, w/4) -> (n, h, w) {0,2}.

    Fuses the unpack into the native cleanup (no intermediate full-size
    batch on the Python side).  Falls back to unpack + postprocess_batch.
    """
    lib = load()
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    n, h, w4 = packed.shape
    assert w4 * 4 == width
    if lib is None:
        from unetseg_tpu.parallel.pipeline import _unpack_mask2

        return postprocess_batch(_unpack_mask2(packed))
    out = np.empty((n, h, width), np.uint8)
    lib.utpu_postprocess_packed_batch(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def contours_per_class(mask: np.ndarray, classes=(1, 2)):
    """Per-class EXTERNAL/SIMPLE contours (BASELINE config 2 extension).

    The reference only polygonizes foreground==2; multi-class studies want
    one contour set per class label.  Returns {class: contours}.
    """
    out = {}
    for c in classes:
        binary = np.where(mask == c, np.uint8(255), np.uint8(0))
        out[c] = extract_contours(binary)
    return out


def contour_json_bytes_labeled(
    labeled: List[Tuple[int, int, List[Tuple[int, int]]]],
    base_name: str,
    orig_w: int,
    orig_h: int,
    scale_x: float,
    scale_y: float,
) -> bytes:
    """Per-class labelme JSON (``labeled`` = [(label, labelIndex, contour)])
    with the truncating point scaling fused in; byte-identical to the
    Python/nlohmann emitter (golden-tested)."""
    lib = load()
    if lib is None:
        from unetseg_tpu.io import contours_py, jsonfmt

        mapped = contours_py.map_contour_points(
            [c for (_, _, c) in labeled], scale_x, scale_y)
        relabeled = [(lab, idx, m) for (lab, idx, _), m
                     in zip(labeled, mapped)]
        return jsonfmt.contour_json_bytes_labeled(
            relabeled, base_name, orig_w, orig_h)
    flat = []
    offsets = [0]
    for _, _, c in labeled:
        flat.extend(c)
        offsets.append(len(flat))
    pts = np.ascontiguousarray(
        np.asarray(flat if flat else np.zeros((0, 2)),
                   dtype=np.int32).reshape(-1, 2))
    offs = np.asarray(offsets, dtype=np.int32)
    labs = np.asarray([lab for (lab, _, _) in labeled], np.int32)
    idxs = np.asarray([idx for (_, idx, _) in labeled], np.int32)
    out_len = ctypes.c_size_t()
    ptr = lib.utpu_contour_json_labeled(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(labeled),
        labs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        base_name.encode(), orig_w, orig_h, scale_x, scale_y,
        ctypes.byref(out_len),
    )
    if not ptr:
        raise MemoryError("utpu_contour_json_labeled failed")
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.utpu_free(ptr)
