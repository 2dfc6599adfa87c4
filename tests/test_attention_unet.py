"""Attention U-Net family (models/attention_unet.py, arXiv:1804.03999).

Same contract tests as the other families: shapes/dtype/grads, gate
behavior, registry dispatch, stem geometry, and a full checkpoint -> engine
drive (the framework promise: any registered arch serves transparently).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import attention_unet, registry

SMALL = ModelConfig(arch="attention_unet", base_channels=4, depth=2,
                    image_size=32, compute_dtype="float32")


def test_shapes_and_grad():
    params = attention_unet.init(jax.random.key(0), SMALL)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    logits = attention_unet.apply(params, x, SMALL)
    assert logits.shape == (2, 32, 32, 3)
    assert logits.dtype == jnp.float32

    def loss(p):
        return jnp.mean(attention_unet.apply(p, x, SMALL) ** 2)

    g = jax.grad(loss)(params)
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
    )


def test_gate_modulates_skips():
    """Saturating att_psi's bias must recover the plain-UNet concat
    (gate -> 1) / suppress the skip entirely (gate -> 0): the attention
    stage is a true multiplicative gate on the skip path, not a no-op."""
    params = attention_unet.init(jax.random.key(0), SMALL)
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 1))

    def with_psi_bias(p, v):
        p = jax.tree_util.tree_map(lambda a: a, p)  # shallow-safe copy
        dec = [dict(s) for s in p["decoder"]]
        for s in dec:
            s["att_psi"] = dict(s["att_psi"])
            s["att_psi"]["b"] = jnp.full_like(s["att_psi"]["b"], v)
        return {**p, "decoder": dec}

    open_gate = attention_unet.apply(with_psi_bias(params, 50.0), x, SMALL)
    shut_gate = attention_unet.apply(with_psi_bias(params, -50.0), x, SMALL)
    # different gates must change the logits (skips carry signal)
    assert not np.allclose(np.asarray(open_gate), np.asarray(shut_gate))

    # with the gate saturated open, the skip contributes exactly as in a
    # plain concat: zeroing the skip-side conv1 weights then makes the two
    # gate extremes agree (only the gated half of the concat differed)
    def zero_skip_half(p):
        dec = [dict(s) for s in p["decoder"]]
        for s in dec:
            s["conv1"] = dict(s["conv1"])
            w = s["conv1"]["w"]
            half = w.shape[2] // 2
            s["conv1"]["w"] = w.at[:, :, :half, :].set(0.0)
        return {**p, "decoder": dec}

    z = zero_skip_half(params)
    a = attention_unet.apply(with_psi_bias(z, 50.0), x, SMALL)
    b = attention_unet.apply(with_psi_bias(z, -50.0), x, SMALL)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_registry_dispatch():
    params = registry.init(jax.random.key(0), SMALL)
    assert "att_x" in params["decoder"][0]
    out = registry.apply(params, jnp.zeros((1, 32, 32, 1)), SMALL)
    assert out.shape == (1, 32, 32, 3)


def test_stem_geometry():
    """The space-to-depth stem + subpixel head keep the I/O contract."""
    cfg = dataclasses.replace(SMALL, stem=2)
    params = attention_unet.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 1))
    logits = attention_unet.apply(params, x, cfg)
    assert logits.shape == (1, 32, 32, 3)


def test_attention_unet_checkpoint_and_engine(tmp_path):
    """An attention_unet checkpoint drives the whole engine transparently."""
    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.io import raw as raw_io

    cache = tmp_path / "eng" / "att.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), SMALL, seed=0)
    assert engine.initialize_engine(str(cache))
    try:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 65536, size=(40, 48), dtype=np.uint16)
        raw_io.write_raw(str(tmp_path / "a.raw"), img)
        assert engine.process_single_image(
            str(tmp_path / "a.raw"), 48, 40, str(tmp_path / "out")
        )
        assert (tmp_path / "out" / "a_mask.png").exists()
    finally:
        engine.cleanup_resources()


def test_trains():
    """One distill-free train step decreases CE+Dice loss on a toy batch."""
    from unetseg_tpu import train

    tx = train.make_optimizer(lr=1e-2, total_steps=8)
    state = train.init_state(jax.random.key(0), SMALL, tx)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, (4, 32, 32)), jnp.int32)
    losses = []
    for _ in range(8):
        state, loss = jax.jit(
            lambda s, b: train.train_step(s, b, cfg=SMALL, tx=tx)
        )(state, (imgs, labels))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
