"""Fused mega-kernels vs the XLA oracle (interpret mode on CPU).

Covers ops/fused_level.py (enc1/dec1 Pallas kernels, layout algebra,
boundary zeroing) and the composed models/unet_fused.py forward path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet, unet_fused
from unetseg_tpu.ops import decode, preprocess
from unetseg_tpu.ops.fused_level import (
    conv1_l_from_u8, dec1_head_fused, enc1_fused, skip_to_padded_e)

DN = ("NHWC", "HWIO", "NHWC")


def _ref_dec1(z, skip, wu, bu, w1, b1, w2, b2, wh, bh):
    x = lax.conv_transpose(z, wu, (2, 2), "VALID", dimension_numbers=DN) + bu
    x = jnp.concatenate([skip, x], axis=-1)
    x = jax.nn.relu(lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=DN) + b1)
    x = jax.nn.relu(lax.conv_general_dilated(
        x, w2, (1, 1), "SAME", dimension_numbers=DN) + b2)
    lg = lax.conv_general_dilated(
        x, wh, (1, 1), "SAME", dimension_numbers=DN) + bh
    l0, l1, l2 = lg[..., 0], lg[..., 1], lg[..., 2]
    best01 = jnp.where(l1 > l0, 1, 0)
    return jnp.where(l2 > jnp.maximum(l0, l1), 2, best01).astype(jnp.uint8)


@pytest.mark.parametrize("B,Hz,C,TR", [
    (2, 16, 8, 8), (1, 32, 16, 16), (2, 24, 8, 4),
])
def test_dec1_head_fused(B, Hz, C, TR):
    H = 2 * Hz
    ks = iter(jax.random.split(jax.random.key(B * Hz + C), 12))
    z = jax.random.normal(next(ks), (B, Hz, Hz, 2 * C), jnp.float32)
    skip = jax.random.normal(next(ks), (B, H, H, C), jnp.float32)
    wu = jax.random.normal(next(ks), (2, 2, 2 * C, C)) * 0.2
    bu = jax.random.normal(next(ks), (C,)) * 0.2
    w1 = jax.random.normal(next(ks), (3, 3, 2 * C, C)) * 0.2
    b1 = jax.random.normal(next(ks), (C,)) * 0.2
    w2 = jax.random.normal(next(ks), (3, 3, C, C)) * 0.2
    b2 = jax.random.normal(next(ks), (C,)) * 0.2
    wh = jax.random.normal(next(ks), (1, 1, C, 3)) * 0.2
    bh = jax.random.normal(next(ks), (3,)) * 0.2
    want = _ref_dec1(z, skip, wu, bu, w1, b1, w2, b2, wh, bh)
    got = dec1_head_fused(
        jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0))),
        skip_to_padded_e(skip),
        wu, bu, w1, b1, w2, b2, wh, bh, tr=TR, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_enc1_fused_chain():
    B, H, C = 2, 32, 8
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (B, H, H), np.uint8))
    ks = iter(jax.random.split(jax.random.key(1), 4))
    w1 = jax.random.normal(next(ks), (3, 3, 1, C), jnp.float32) * 0.5
    b1 = jax.random.normal(next(ks), (C,), jnp.float32) * 0.2
    w2 = jax.random.normal(next(ks), (3, 3, C, C), jnp.float32) * 0.2
    b2 = jax.random.normal(next(ks), (C,), jnp.float32) * 0.2

    x = u8.astype(jnp.float32)[..., None] / 255.0
    c1_ref = jax.nn.relu(lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=DN) + b1)
    c2_ref = jax.nn.relu(lax.conv_general_dilated(
        c1_ref, w2, (1, 1), "SAME", dimension_numbers=DN) + b2)
    pool_ref = lax.reduce_window(c2_ref, -jnp.inf, lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    c1L = conv1_l_from_u8(u8, w1, b1, dtype=jnp.float32)
    skip_pe, pooled_pad = enc1_fused(c1L, w2, b2, tr=12, interpret=True)

    sk = skip_pe[:, 2:H + 2, 1:H // 2 + 1, :].reshape(B, H, H, C)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(c2_ref),
                               atol=2e-5, rtol=1e-4)
    # borders of the padded-E layout are zero (conv SAME pad contract)
    assert float(jnp.abs(skip_pe[:, :2]).max()) == 0
    assert float(jnp.abs(skip_pe[:, H + 2:]).max()) == 0
    assert float(jnp.abs(skip_pe[:, :, 0, :C]).max()) == 0
    assert float(jnp.abs(skip_pe[:, :, -1, C:]).max()) == 0
    np.testing.assert_allclose(np.asarray(pooled_pad[:, 1:H // 2 + 1]),
                               np.asarray(pool_ref), atol=2e-5, rtol=1e-4)
    assert float(jnp.abs(pooled_pad[:, 0]).max()) == 0
    assert float(jnp.abs(pooled_pad[:, -1]).max()) == 0


def test_apply_fused_mask_matches_pipeline(monkeypatch):
    cfg = ModelConfig(base_channels=8, depth=2, image_size=32,
                      compute_dtype="float32")
    assert unet_fused.supports(cfg)
    params = unet.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (3, 32, 32), np.uint8))

    x = preprocess.model_input_from_u8(u8)[..., None]
    want = np.asarray(decode.decode_mask(unet.apply(params, x, cfg),
                                         cfg.num_classes))

    from unetseg_tpu.ops import fused_level
    monkeypatch.setattr(
        unet_fused, "enc1_fused",
        functools.partial(fused_level.enc1_fused, interpret=True))
    monkeypatch.setattr(
        unet_fused, "dec1_head_fused",
        functools.partial(fused_level.dec1_head_fused, interpret=True))
    got = np.asarray(unet_fused.apply_fused_mask(params, u8, cfg))
    np.testing.assert_array_equal(got, want)


def test_supports_gating():
    assert unet_fused.supports(ModelConfig())  # flagship 512²
    assert not unet_fused.supports(ModelConfig(image_size=64))  # 68 % 12 != 0
    assert not unet_fused.supports(ModelConfig(arch="unetpp"))
    assert not unet_fused.supports(ModelConfig(num_classes=4))
    # stem>1 checkpoints must fall back: conv1_l_from_u8 hard-codes Cin=1
    assert not unet_fused.supports(ModelConfig(stem=4))
