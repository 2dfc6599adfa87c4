"""Winograd F(2x2,3x3) conv — XLA and Pallas variants vs the direct conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from unetseg_tpu.ops.winograd import (
    conv3x3_winograd,
    conv3x3_winograd_pallas,
    transform_weights,
)

DN = ("NHWC", "HWIO", "NHWC")


def _direct(x, w, b, relu=True):
    out = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                   dimension_numbers=DN) + b
    return jnp.maximum(out, 0) if relu else out


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


@pytest.mark.parametrize("shape", [(1, 8, 8, 3, 5), (2, 16, 32, 8, 4),
                                   (8, 8, 8, 4, 4)])
def test_xla_winograd_matches_direct(shape):
    B, H, W, C, D = shape
    x = _rand((B, H, W, C), 0)
    w = _rand((3, 3, C, D), 1, 0.2)
    b = _rand((D,), 2)
    got = conv3x3_winograd(x, w, b, gemm_dtype=jnp.float32, batch_chunk=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_direct(x, w, b)), atol=1e-4
    )


@pytest.mark.parametrize("shape", [(1, 8, 8, 4, 4), (2, 16, 32, 8, 16)])
def test_pallas_winograd_matches_direct(shape):
    B, H, W, C, D = shape
    x = _rand((B, H, W, C), 3)
    w = _rand((3, 3, C, D), 4, 0.2)
    b = _rand((D,), 5)
    got = conv3x3_winograd_pallas(x, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_direct(x, w, b)), atol=1e-4
    )


def test_pallas_winograd_channel_steps():
    """C > KC exercises the sequential accumulation axis."""
    x = _rand((1, 8, 16, 16, ), 6).reshape(1, 8, 16, 16)
    w = _rand((3, 3, 16, 8), 7, 0.2)
    b = _rand((8,), 8)
    got = conv3x3_winograd_pallas(x, w, b, interpret=True, kc=4, td=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_direct(x, w, b)), atol=1e-4
    )


def test_no_relu():
    x = _rand((1, 8, 8, 4), 9)
    w = _rand((3, 3, 4, 4), 10, 0.2)
    b = _rand((4,), 11)
    got = conv3x3_winograd_pallas(x, w, b, relu=False, interpret=True)
    want = _direct(x, w, b, relu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    assert float(jnp.min(got)) < 0


def test_weight_transform_identity_filter():
    """A centered delta filter transforms to a U whose conv is identity."""
    C = 2
    w = np.zeros((3, 3, C, C), np.float32)
    for c in range(C):
        w[1, 1, c, c] = 1.0
    x = _rand((1, 8, 8, C), 12)
    b = jnp.zeros((C,))
    got = conv3x3_winograd_pallas(jnp.asarray(x), jnp.asarray(w), b,
                                  relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


def test_model_with_winograd_impl_matches_xla():
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.models import unet

    cfg_x = ModelConfig(base_channels=4, depth=2, image_size=32,
                        compute_dtype="float32")
    cfg_w = ModelConfig(base_channels=4, depth=2, image_size=32,
                        compute_dtype="float32", conv_impl="experimental_winograd")
    params = unet.init(jax.random.key(0), cfg_x)
    x = _rand((2, 32, 32, 1), 13)
    a = unet.apply(params, x, cfg_x)
    bb = unet.apply(params, x, cfg_w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-3)
