"""fold2 Pallas conv vs the XLA conv oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from unetseg_tpu.ops.fold_conv import conv3x3_fold2, fold2_weights

DN = ("NHWC", "HWIO", "NHWC")


def _oracle(x, w, b, relu):
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN) + b
    return jnp.maximum(y, 0) if relu else y


@pytest.mark.parametrize("shape", [
    (2, 16, 16, 64, 64),
    (1, 8, 32, 128, 64),
    (2, 16, 16, 64, 128),
])
@pytest.mark.parametrize("relu", [True, False])
def test_fold2_matches_xla(shape, relu):
    B, H, W, C, D = shape
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, C, D), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.key(2), (D,), jnp.float32)
    ref = _oracle(x, w, b, relu)
    out = conv3x3_fold2(x, w, b, relu=relu, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fold2_weights_shape():
    w = jnp.ones((3, 3, 64, 64))
    w2 = fold2_weights(w)
    assert w2.shape == (3, 256, 128)
    # dxout=0 block: taps dxx 0..2 carry w; dxx 3 is zero
    w4 = w2.reshape(3, 4, 64, 128)
    assert float(jnp.abs(w4[:, 3, :, :64]).max()) == 0.0
    assert float(jnp.abs(w4[:, 0, :, 64:]).max()) == 0.0
