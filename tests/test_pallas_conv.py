"""Pallas conv kernel vs the XLA conv oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from unetseg_tpu.ops.pallas_conv import conv3x3_bias_act

DN = ("NHWC", "HWIO", "NHWC")


def _oracle(x, w, b, relu=True):
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN
    ) + b
    return jnp.maximum(out, 0) if relu else out


@pytest.mark.parametrize(
    "shape",
    [
        (1, 8, 64, 8, 16),   # D > C
        (2, 16, 128, 8, 8),  # batch > 1, multiple row tiles
        (1, 32, 64, 16, 8),  # D < C
    ],
)
def test_matches_xla_conv(shape):
    B, H, W, C, D = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, C, D)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))
    got = conv3x3_bias_act(x, w, b, interpret=True)
    want = _oracle(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_no_relu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    got = conv3x3_bias_act(x, w, b, relu=False, interpret=True)
    want = _oracle(x, w, b, relu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert float(jnp.min(got)) < 0  # relu really off


def test_multi_channel_steps():
    """C > KC forces accumulation across sequential grid steps."""
    rng = np.random.default_rng(2)
    B, H, W, C, D = 1, 8, 128, 16, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, C, D)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))
    got = conv3x3_bias_act(x, w, b, kc=8, td=8, th=4, interpret=True)
    want = _oracle(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
