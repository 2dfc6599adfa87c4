import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64, compute_dtype="float32")


def test_output_shape_and_dtype():
    params = unet.init(jax.random.key(0), SMALL)
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    logits = unet.apply(params, x, SMALL)
    assert logits.shape == (2, 64, 64, 3)
    assert logits.dtype == jnp.float32


def test_full_contract_shape():
    """The reference contract: 1x1x512x512 in, 1xCx512x512 out (NHWC here).

    Uses eval_shape so the full 31M-param model costs nothing in CI.
    """
    cfg = ModelConfig()
    params_shape = jax.eval_shape(lambda k: unet.init(k, cfg), jax.random.key(0))
    x = jax.ShapeDtypeStruct((1, 512, 512, 1), jnp.float32)
    out = jax.eval_shape(lambda p, x: unet.apply(p, x, cfg), params_shape, x)
    assert out.shape == (1, 512, 512, 3)
    assert out.dtype == jnp.float32
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params_shape))
    # Classic depth-4 base-64 UNet with transposed-conv upsampling: ~31M params.
    assert 30e6 < n < 33e6


def test_jit_and_grad():
    params = unet.init(jax.random.key(0), SMALL)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 1))

    fwd = jax.jit(lambda p, x: unet.apply(p, x, SMALL))
    logits = fwd(params, x)
    assert bool(jnp.all(jnp.isfinite(logits)))

    def loss(p):
        return jnp.mean(unet.apply(p, x, SMALL) ** 2)

    g = jax.grad(loss)(params)
    gnorm = jnp.sqrt(
        sum(jnp.sum(l**2) for l in jax.tree_util.tree_leaves(g))
    )
    assert bool(jnp.isfinite(gnorm)) and float(gnorm) > 0


def test_deterministic():
    params = unet.init(jax.random.key(0), SMALL)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 1))
    a = unet.apply(params, x, SMALL)
    b = unet.apply(params, x, SMALL)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stem_shapes_and_grad():
    """Slim-flagship stem (space-to-depth 2x2 + subpixel head): I/O contract
    unchanged (512²-analog in, 3-class same-size logits out); internals at
    half resolution."""
    cfg = ModelConfig(base_channels=8, depth=2, image_size=64,
                      compute_dtype="float32", stem=2)
    params = unet.init(jax.random.key(0), cfg)
    # first conv consumes the 4 stacked subpixels, head emits 4*3 channels
    assert params["encoder"][0]["conv1"]["w"].shape == (3, 3, 4, 8)
    assert params["head"]["w"].shape == (1, 1, 8, 12)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 1))
    logits = unet.apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 3)
    assert logits.dtype == jnp.float32

    g = jax.grad(lambda p: jnp.mean(unet.apply(p, x, cfg) ** 2))(params)
    gnorm = jnp.sqrt(sum(jnp.sum(l**2) for l in jax.tree_util.tree_leaves(g)))
    assert bool(jnp.isfinite(gnorm)) and float(gnorm) > 0


def test_stem_space_to_depth_roundtrip():
    x = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3))
    y = unet._depth_to_space(unet._space_to_depth(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stem_subpixel_head_is_local():
    """Each 2x2 output block comes from one head application: with zero head
    weights the logits equal the per-subpixel head bias pattern."""
    cfg = ModelConfig(base_channels=8, depth=2, image_size=64,
                      compute_dtype="float32", stem=2)
    params = unet.init(jax.random.key(0), cfg)
    params["head"]["w"] = jnp.zeros_like(params["head"]["w"])
    bias = jnp.arange(12, dtype=jnp.float32)
    params["head"]["b"] = bias
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 1))
    logits = np.asarray(unet.apply(params, x, cfg))
    # subpixel (di, dj) carries bias[(di*2+dj)*3 : +3]
    for di in range(2):
        for dj in range(2):
            want = np.asarray(bias).reshape(2, 2, 3)[di, dj]
            np.testing.assert_allclose(
                logits[0, di::2, dj::2],
                np.broadcast_to(want, (32, 32, 3)), rtol=1e-6)


def test_relu_nonnegativity_of_features():
    """Feature maps pre-head are ReLU outputs; with zero head weights the
    logits must be exactly the head bias."""
    params = unet.init(jax.random.key(0), SMALL)
    params["head"]["w"] = jnp.zeros_like(params["head"]["w"])
    params["head"]["b"] = jnp.array([1.0, 2.0, 3.0], jnp.float32)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 1))
    logits = unet.apply(params, x, SMALL)
    np.testing.assert_allclose(
        np.asarray(logits), np.broadcast_to([1.0, 2.0, 3.0], (1, 64, 64, 3)), rtol=1e-6
    )
