"""PTQ (w8a8) path: calibration, quantized forward, checkpoint round trip,
engine serving via the registry arch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu import checkpoint, quantize, train
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.data import training_batch
from unetseg_tpu.models import unet

SMALL = ModelConfig(base_channels=8, depth=2, image_size=64,
                    compute_dtype="float32")


def _calib_batches(rng, n_batches=2, n=4):
    for _ in range(n_batches):
        imgs, _ = training_batch(rng, n, size=64)
        yield imgs


def test_calibrate_covers_all_conv_sites():
    params = unet.init(jax.random.key(0), SMALL)
    rng = np.random.default_rng(0)
    scales = quantize.calibrate(params, SMALL, _calib_batches(rng))
    assert set(scales) == set(quantize._conv_order(SMALL))
    assert all(v > 0 for v in scales.values())


def test_up2_w8a8_exact_on_integer_grid():
    """With integer-valued weights/activations inside the int8 range the
    quantization is exact, so the int8 transposed conv must equal the f32
    lax.conv_transpose bit for bit."""
    from jax import lax

    rng = np.random.default_rng(1)
    x = rng.integers(-40, 40, (2, 5, 6, 3)).astype(np.float32)
    w = rng.integers(-5, 5, (2, 2, 3, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    site = {"w_q": w.astype(np.int8), "w_scale": np.ones(4, np.float32),
            "b": b, "act_scale": np.float32(1.0)}
    got = np.asarray(quantize._up2_w8a8(jnp.asarray(x), site))
    want = np.asarray(lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(w), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


@pytest.mark.parametrize("stem", [1, 2, 4])
def test_w8a8_close_to_f32_on_trained_model(stem, tmp_path):
    """Train a tiny model, quantize it, and require high mask agreement —
    the PTQ accuracy contract in miniature."""
    cfg = dataclasses.replace(SMALL, stem=stem)
    rng = np.random.default_rng(2)
    tx = train.make_optimizer(lr=1e-2, total_steps=120)
    state = train.init_state(jax.random.key(0), cfg, tx)
    step = jax.jit(lambda s, b: train.train_step(s, b, cfg, tx),
                   donate_argnums=(0,))
    for _ in range(120):
        imgs, labels = training_batch(rng, 8, size=64)
        state, _ = step(state, (imgs, labels))
    params = jax.device_get(state.params)

    scales = quantize.calibrate(params, cfg, _calib_batches(rng))
    q = quantize.quantize_params(params, cfg, scales)

    imgs, _ = training_batch(rng, 8, size=64)
    f32_mask = np.asarray(jnp.argmax(unet.apply(params, imgs, cfg), -1))
    q_mask = np.asarray(jnp.argmax(
        quantize.apply_w8a8(q, jnp.asarray(imgs), cfg), -1))
    agreement = float(np.mean(f32_mask == q_mask))
    assert agreement > 0.99, agreement


def test_quantize_checkpoint_serves_through_engine(tmp_path):
    from unetseg_tpu import engine

    src = tmp_path / "f32.ckpt"
    checkpoint.create(str(src), SMALL, seed=0)
    rng = np.random.default_rng(3)
    dst = tmp_path / "w8a8.ckpt"
    q, qcfg = quantize.quantize_checkpoint(
        str(src), str(dst), _calib_batches(rng))
    assert qcfg.arch == "unet_w8a8"

    # round trip restores int8 weights + scales
    q2, cfg2 = checkpoint.load(str(dst))
    assert cfg2.arch == "unet_w8a8"
    assert q2["encoder"][0]["conv1"]["w_q"].dtype == np.int8
    np.testing.assert_array_equal(
        np.asarray(q2["head"]["w_q"]), np.asarray(q["head"]["w_q"]))

    # and the engine serves it end-to-end via the registry dispatch
    from unetseg_tpu.io import raw as raw_io

    assert engine.initialize_engine(str(dst))
    try:
        raw = rng.integers(0, 65536, (70, 90), np.uint16)
        raw_io.write_raw(str(tmp_path / "q.raw"), raw)
        out = tmp_path / "out"
        assert engine.process_single_image(str(tmp_path / "q.raw"),
                                           90, 70, str(out))
        assert (out / "q_mask.png").exists()
    finally:
        engine.cleanup_resources()


def test_calibrate_empty_batches_raises(tmp_path):
    """Zero calibration data must raise, not produce all-saturating scales
    (round-4 review finding)."""
    import pytest

    from unetseg_tpu import quantize
    from unetseg_tpu.models import unet

    cfg = SMALL
    params = jax.jit(unet.init, static_argnums=(1,))(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="calibration"):
        quantize.calibrate(params, cfg, [])
