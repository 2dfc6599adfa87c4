"""reference_twin (the NumPy/cv2 C++-pipeline oracle) vs the framework.

The twin must agree with the production path when both run in float32 —
that agreement is what licenses bench.py's ``parity_polygon_iou`` as the
BASELINE "polygon IoU vs the C++ reference" metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unetseg_tpu import reference_twin as twin
from unetseg_tpu.config import ModelConfig
from unetseg_tpu.models import unet
from unetseg_tpu.ops import decode


@pytest.mark.parametrize("stem", [1, 2, 4])  # 4 = the shipped slim4 geometry
def test_numpy_forward_matches_jax_f32(stem):
    cfg = ModelConfig(base_channels=8, depth=2, image_size=64,
                      compute_dtype="float32", stem=stem)
    params = jax.device_get(unet.init(jax.random.key(0), cfg))
    x = np.asarray(
        jax.random.uniform(jax.random.key(1), (64, 64)), np.float32)
    want = np.asarray(unet.apply(params, jnp.asarray(x)[None, ..., None], cfg))[0]
    got = twin.numpy_unet_logits(params, x, cfg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_reference_argmax_tie_break():
    # ties resolve to the LOWEST class index (strict CMP_GT from -FLT_MAX)
    logits = np.zeros((2, 2, 3), np.float32)
    logits[0, 0] = [1.0, 1.0, 1.0]     # tie everywhere -> class 0
    logits[0, 1] = [0.0, 2.0, 2.0]     # tie 1/2 -> class 1
    logits[1, 0] = [-5.0, -5.0, -4.0]  # negative values still decode
    got = twin.reference_argmax(logits)
    assert got[0, 0] == 0 and got[0, 1] == 1 and got[1, 0] == 2
    # and it matches the framework decoder on random logits
    rng = np.random.default_rng(0)
    r = rng.standard_normal((32, 32, 3)).astype(np.float32)
    ours = np.asarray(decode.decode_mask(jnp.asarray(r)[None], 3))[0]
    np.testing.assert_array_equal(twin.reference_argmax(r), ours)


def test_twin_postprocess_matches_device_ops():
    import cv2

    from unetseg_tpu.ops import postprocess as device_post

    rng = np.random.default_rng(3)
    noise = rng.random((128, 128)).astype(np.float32)
    smooth = cv2.blur(noise, (15, 15))
    mask = np.zeros((128, 128), np.uint8)
    mask[smooth > 0.5] = 2
    mask[(smooth > 0.47) & (smooth <= 0.5)] = 1

    want = np.asarray(device_post.postprocess_mask(jnp.asarray(mask)))
    got = twin.twin_postprocess(mask)
    np.testing.assert_array_equal(got, want)


def test_twin_pipeline_end_to_end_parity():
    """Same checkpoint -> production f32 path vs twin: identical polygons."""
    from unetseg_tpu import metrics
    from unetseg_tpu.io import native

    cfg = ModelConfig(base_channels=8, depth=2, image_size=64,
                      compute_dtype="float32")
    params = jax.device_get(unet.init(jax.random.key(0), cfg))
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (64, 64), dtype=np.uint8)

    # production path (f32): device program + host cleanup + C++ contours
    x = jnp.asarray(u8, jnp.float32)[None, ..., None] / 255.0
    logits = unet.apply(params, x, cfg)
    mask = np.asarray(decode.decode_mask(logits, 3))[0]
    mask = native.postprocess_batch(mask[None])[0]
    vis = np.asarray(decode.mask_to_image(jnp.asarray(mask)))
    ours = [[(int(p[0] * (128 / 64)), int(p[1] * (96 / 64))) for p in c]
            for c in native.extract_contours(vis)]

    theirs = twin.twin_pipeline(params, cfg, u8, 128, 96)
    if not ours and not theirs:
        pytest.skip("random net produced no contours for this seed")
    iou = metrics.polygon_iou(ours, theirs, 128, 96)
    assert iou == 1.0
