import jax
import jax.numpy as jnp
import numpy as np

from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import registry, unetpp

SMALL = ModelConfig(arch="unetpp", base_channels=4, depth=2, image_size=32,
                    compute_dtype="float32")


def test_shapes_and_grad():
    params = unetpp.init(jax.random.key(0), SMALL)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    logits = unetpp.apply(params, x, SMALL)
    assert logits.shape == (2, 32, 32, 3)
    assert logits.dtype == jnp.float32

    def loss(p):
        return jnp.mean(unetpp.apply(p, x, SMALL) ** 2)

    g = jax.grad(loss)(params)
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
    )


def test_deep_supervision_head_average():
    cfg = ModelConfig(arch="unetpp", base_channels=4, depth=2, image_size=32,
                      compute_dtype="float32", deep_supervision=True)
    params = unetpp.init(jax.random.key(0), cfg)
    assert len(params["heads"]) == cfg.depth
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 1))
    logits = unetpp.apply(params, x, cfg)
    assert logits.shape == (1, 32, 32, 3)


def test_registry_dispatch():
    params = registry.init(jax.random.key(0), SMALL)
    x = jnp.zeros((1, 32, 32, 1))
    out = registry.apply(params, x, SMALL)
    assert out.shape == (1, 32, 32, 3)

    unet_cfg = ModelConfig(base_channels=4, depth=2, image_size=32,
                           compute_dtype="float32")
    p2 = registry.init(jax.random.key(0), unet_cfg)
    assert "encoder" in p2  # plain UNet pytree
    import pytest

    with pytest.raises(KeyError):
        registry.get("nope")


def test_unetpp_checkpoint_and_engine(tmp_path):
    """A UNet++ checkpoint drives the whole engine transparently."""
    import numpy as np

    from unetseg_tpu import checkpoint, engine
    from unetseg_tpu.io import raw as raw_io

    cfg = ModelConfig(arch="unetpp", base_channels=4, depth=2, image_size=32,
                      compute_dtype="float32")
    cache = tmp_path / "eng" / "pp.ckpt"
    cache.parent.mkdir()
    checkpoint.create(str(cache), cfg, seed=0)
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


def test_head_count_config_mismatch_raises():
    """A DS checkpoint served with deep_supervision=False must raise, not
    silently feed heads[0] with the wrong features (round-4 review)."""
    import dataclasses

    import pytest

    cfg_ds = dataclasses.replace(SMALL, deep_supervision=True)
    params = unetpp.init(jax.random.key(0), cfg_ds)
    x = jnp.zeros((1, SMALL.image_size, SMALL.image_size, 1), jnp.float32)
    cfg_plain = dataclasses.replace(cfg_ds, deep_supervision=False)
    with pytest.raises(ValueError, match="head"):
        unetpp.apply(params, x, cfg_plain)
