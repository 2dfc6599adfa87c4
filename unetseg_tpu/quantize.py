"""Post-training quantization (PTQ) — the TensorRT-plan analog.

The reference's ``.trt`` artifact implies TensorRT's precision optimization
under an accuracy bound (``/root/reference/.gitignore:2-7``: .pt -> .onnx ->
.trt).  This module is that capability for the TPU framework:

* :func:`calibrate` runs representative slices through the f32 model and
  records per-conv input absolute maxima (the activation scales);
* :func:`quantize_params` folds per-output-channel weight scales and emits
  an int8 parameter pytree (weights int8, biases f32, scales f32);
* :func:`apply_w8a8` is the quantized forward: activations quantize to int8
  at each conv input, convs run int8 x int8 -> int32 (XLA lowers these to
  the MXU's int8 path where profitable), dequantize + bias + ReLU in f32;
* quantized checkpoints round-trip through checkpoint.py with
  ``arch="unet_w8a8"`` so the registry dispatch makes EVERY pipeline
  (engine, batch, tiles, TTA, service) serve them unchanged.

Accuracy contract: mask agreement vs the f32 parent is measured at
quantization time (benchmarks/quantize_slim.py) — the same >=0.999 polygon
IoU bound the distillation uses.  Performance: on this chip XLA's int8
convs measured no faster than bf16 end-to-end (docs/PERFORMANCE.md round-1
ceilings and the round-3 account), so w8a8 is an opt-in artifact (half the
checkpoint bytes, int8 HBM traffic) rather than the serving default.

Supports the UNet family including the stem geometry (models/unet.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet as unet_mod

_CONV_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# calibration: per-conv input absmax over representative data
# ---------------------------------------------------------------------------

def _conv_order(cfg: ModelConfig) -> List[str]:
    """Stable names for every conv site, in forward order."""
    names = []
    for i in range(cfg.depth):
        names += [f"enc{i}.conv1", f"enc{i}.conv2"]
    names += ["bottleneck.conv1", "bottleneck.conv2"]
    for i in range(cfg.depth):
        names += [f"dec{i}.up", f"dec{i}.conv1", f"dec{i}.conv2"]
    names += ["head"]
    return names


def _forward_f32(params, x, cfg: ModelConfig, record=None):
    """unet.apply in f32 with optional per-conv input recording.

    Mirrors models/unet.py apply exactly (XLA impl) so the recorded scales
    match the tensors the quantized forward will see.
    """
    dtype = jnp.float32

    def obs(name, t):
        if record is not None:
            record.append((name, jnp.max(jnp.abs(t))))
        return t

    def conv(name, t, p, relu=True):
        t = obs(name, t)
        y = lax.conv_general_dilated(
            t, p["w"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=_CONV_DN) + p["b"].astype(dtype)
        return jax.nn.relu(y) if relu else y

    x = x.astype(dtype)
    if cfg.stem > 1:
        x = unet_mod._space_to_depth(x, cfg.stem)

    skips = []
    for i, stage in enumerate(params["encoder"]):
        x = conv(f"enc{i}.conv1", x, stage["conv1"])
        x = conv(f"enc{i}.conv2", x, stage["conv2"])
        skips.append(x)
        x = unet_mod._max_pool_2x2(x)

    x = conv("bottleneck.conv1", x, params["bottleneck"]["conv1"])
    x = conv("bottleneck.conv2", x, params["bottleneck"]["conv2"])

    for i, (stage, skip) in enumerate(zip(params["decoder"], reversed(skips))):
        x = obs(f"dec{i}.up", x)
        x = lax.conv_transpose(
            x, stage["up"]["w"].astype(dtype), (2, 2), "VALID",
            dimension_numbers=_CONV_DN) + stage["up"]["b"].astype(dtype)
        x = jnp.concatenate([skip, x], axis=-1)
        x = conv(f"dec{i}.conv1", x, stage["conv1"])
        x = conv(f"dec{i}.conv2", x, stage["conv2"])

    logits = conv("head", x, params["head"], relu=False)
    if cfg.stem > 1:
        logits = unet_mod._depth_to_space(logits, cfg.stem)
    return logits


def calibrate(params, cfg: ModelConfig, calib_batches) -> Dict[str, float]:
    """Per-conv activation scales from representative model inputs.

    ``calib_batches``: iterable of (N, H, W, 1) float arrays in [0, 1] (the
    normalized serving distribution).  Returns {conv_name: absmax}.
    """
    names = _conv_order(cfg)

    @jax.jit
    def run(p, x):
        record = []
        logits = _forward_f32(p, x, cfg, record)
        got = [n for n, _ in record]
        assert got == names, f"conv order mismatch: {got} vs {names}"
        return jnp.stack([v for _, v in record]), logits

    mx = np.zeros((len(names),), np.float64)
    checked = False
    for xb in calib_batches:
        xb = jnp.asarray(xb)
        scales, logits = run(params, xb)
        if not checked:
            # _forward_f32 hand-mirrors models/unet.apply so the recorded
            # scales match the tensors the quantized forward will see; this
            # guard turns any future drift between the two forwards into a
            # loud calibration-time error instead of a silently
            # mis-calibrated checkpoint.
            import dataclasses

            f32_cfg = dataclasses.replace(cfg, compute_dtype="float32")
            ref = unet_mod.apply(
                params, xb.astype(jnp.float32), f32_cfg).astype(jnp.float32)
            drift = float(jnp.max(jnp.abs(logits - ref)))
            # tolerance is relative to the logit scale: TPU default
            # precision decomposes f32 convs through bf16 passes, so two
            # equivalent programs legitimately differ by rounding (~1% of
            # max|logit| measured); STRUCTURAL drift (a missing stem, a
            # changed activation) produces deltas on the order of the
            # logits themselves and still trips this.
            tol = 0.05 * max(1.0, float(jnp.max(jnp.abs(ref))))
            if not drift < tol:
                raise AssertionError(
                    f"calibration forward drifted from unet.apply "
                    f"(max |delta| = {drift} > {tol}); "
                    "update quantize._forward_f32")
            checked = True
        mx = np.maximum(mx, np.asarray(scales))
    if not checked or not np.all(mx > 0):
        # an empty/exhausted iterable (or an all-zero input) would yield
        # zero scales -> every activation saturates and the served w8a8
        # model emits noise with no error anywhere (round-4 review finding)
        raise ValueError(
            "calibration saw no data (or produced zero activation scales) "
            f"— got {int(np.sum(mx > 0))}/{len(mx)} nonzero scales; pass "
            "at least one representative batch")
    return {n: float(v) for n, v in zip(names, mx)}


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------

def _quant_w(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: w ~= w_q * scale[None,None,None,:]."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return w_q, scale


def _quant_site(p, act_absmax: float) -> Dict[str, Any]:
    w_q, w_scale = _quant_w(p["w"])
    return {
        "w_q": w_q,
        "w_scale": w_scale,
        "b": np.asarray(p["b"], np.float32),
        "act_scale": np.float32(max(act_absmax, 1e-12) / 127.0),
    }


def quantize_params(params, cfg: ModelConfig,
                    act_scales: Dict[str, float]) -> Dict[str, Any]:
    """f32 pytree + calibration -> int8 pytree (for :func:`apply_w8a8`)."""
    params = jax.device_get(params)
    q: Dict[str, Any] = {"encoder": [], "decoder": []}
    for i, stage in enumerate(params["encoder"]):
        q["encoder"].append({
            "conv1": _quant_site(stage["conv1"], act_scales[f"enc{i}.conv1"]),
            "conv2": _quant_site(stage["conv2"], act_scales[f"enc{i}.conv2"]),
        })
    q["bottleneck"] = {
        "conv1": _quant_site(params["bottleneck"]["conv1"],
                             act_scales["bottleneck.conv1"]),
        "conv2": _quant_site(params["bottleneck"]["conv2"],
                             act_scales["bottleneck.conv2"]),
    }
    for i, stage in enumerate(params["decoder"]):
        q["decoder"].append({
            "up": _quant_site(stage["up"], act_scales[f"dec{i}.up"]),
            "conv1": _quant_site(stage["conv1"], act_scales[f"dec{i}.conv1"]),
            "conv2": _quant_site(stage["conv2"], act_scales[f"dec{i}.conv2"]),
        })
    q["head"] = _quant_site(params["head"], act_scales["head"])
    return q


# ---------------------------------------------------------------------------
# quantized forward (w8a8: int8 weights, int8 activations, int32 accumulate)
# ---------------------------------------------------------------------------

def _quant_act(x, s):
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)


def _conv_w8a8(x, site, relu=True):
    x_q = _quant_act(x, site["act_scale"])
    y = lax.conv_general_dilated(
        x_q, site["w_q"], (1, 1), "SAME", dimension_numbers=_CONV_DN,
        preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32)
         * (site["act_scale"] * site["w_scale"])[None, None, None, :]
         + site["b"])
    return jax.nn.relu(y) if relu else y


def _up2_w8a8(x, site):
    """2x2 stride-2 transposed conv as an int8 GEMM over channels:
    out(2i+di, 2j+dj, d) = sum_c x(i,j,c) * w(1-di, 1-dj, c, d) — the
    non-overlapping case, so a (C -> 4D) dot + subpixel rearrange."""
    b, h, w, c = x.shape
    x_q = _quant_act(x, site["act_scale"])
    wk = site["w_q"][::-1, ::-1]                      # kernel mirror
    wk = jnp.transpose(wk, (2, 0, 1, 3))              # (C, 2, 2, D)
    d = wk.shape[-1]
    wk = wk.reshape(c, 4 * d)
    y = lax.dot_general(
        x_q.reshape(-1, c), wk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.reshape(b, h, w, 2, 2, d).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, 2 * h, 2 * w, d)
    y = (y.astype(jnp.float32)
         * (site["act_scale"] * site["w_scale"])[None, None, None, :]
         + site["b"])
    return y


def apply_w8a8(qparams, x: jax.Array,
               cfg: ModelConfig = ModelConfig()) -> jax.Array:
    """Quantized UNet forward; same I/O contract as models/unet.apply."""
    x = x.astype(jnp.float32)
    if cfg.stem > 1:
        x = unet_mod._space_to_depth(x, cfg.stem)

    skips = []
    for stage in qparams["encoder"]:
        x = _conv_w8a8(x, stage["conv1"])
        x = _conv_w8a8(x, stage["conv2"])
        skips.append(x)
        x = unet_mod._max_pool_2x2(x)

    x = _conv_w8a8(x, qparams["bottleneck"]["conv1"])
    x = _conv_w8a8(x, qparams["bottleneck"]["conv2"])

    for stage, skip in zip(qparams["decoder"], reversed(skips)):
        x = _up2_w8a8(x, stage["up"])
        x = jnp.concatenate([skip, x], axis=-1)
        x = _conv_w8a8(x, stage["conv1"])
        x = _conv_w8a8(x, stage["conv2"])

    logits = _conv_w8a8(x, qparams["head"], relu=False)
    if cfg.stem > 1:
        logits = unet_mod._depth_to_space(logits, cfg.stem)
    return logits.astype(jnp.float32)


def _w8a8_init(rng, cfg):
    raise ValueError(
        "arch='unet_w8a8' checkpoints are produced by quantization "
        "(unetseg_tpu.quantize.quantize_checkpoint), not random init")


def register_arch() -> None:
    """Make quantized checkpoints first-class citizens of the registry."""
    from unetseg_tpu.models import registry

    registry.register("unet_w8a8", _w8a8_init, apply_w8a8)


register_arch()


# ---------------------------------------------------------------------------
# one-call artifact flow: f32 checkpoint -> calibrated w8a8 checkpoint
# ---------------------------------------------------------------------------

def quantize_checkpoint(src_path: str, dst_path: str, calib_batches,
                        ) -> Tuple[Dict[str, Any], ModelConfig]:
    """Calibrate + quantize a saved f32 checkpoint into a w8a8 one.

    The emitted checkpoint carries ``arch="unet_w8a8"`` so
    ``engine.initialize_engine(dst_path)`` serves it with no other changes —
    the `.trt`-style "optimized engine artifact" flow.
    """
    import dataclasses

    from unetseg_tpu import checkpoint

    params, cfg = checkpoint.load(src_path)
    if cfg.arch != "unet":
        raise ValueError("quantization covers the UNet family")
    scales = calibrate(params, cfg, calib_batches)
    q = quantize_params(params, cfg, scales)
    qcfg = dataclasses.replace(cfg, arch="unet_w8a8")
    checkpoint.save(dst_path, q, qcfg)
    return q, qcfg
